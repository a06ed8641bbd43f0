from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from nifi_tekst_bundle_spark.schemas import CHANGE_EVENT_SCHEMA, TRANSCRIPTS_SCHEMA  # noqa: E402
from nifi_tekst_bundle_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


_INT_FIELDS = {"lsn", "turn_idx", "src_turn_idx", "schema_version"}


def _records(pdf: pd.DataFrame) -> list[dict]:
    recs = pdf.to_dict("records")
    for r in recs:
        for k, v in list(r.items()):
            if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
                r[k] = None
            elif isinstance(v, pd.Timestamp):
                r[k] = v.to_pydatetime()
            elif k in _INT_FIELDS:
                r[k] = int(v)
    return recs


def spark_events(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(_records(pdf), schema=CHANGE_EVENT_SCHEMA)


def spark_seed(spark, pdf: pd.DataFrame):
    return spark.createDataFrame(_records(pdf), schema=TRANSCRIPTS_SCHEMA)


def normalize_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for cell-for-cell comparison under stable
    (conv_id, turn_idx) ordering."""
    out = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    if "ts" in out.columns:
        out["ts"] = pd.to_datetime(out["ts"])
    out = out.astype(object).where(pd.notnull(out), None)
    return out
