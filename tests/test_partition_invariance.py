"""Hash-partitioned map_groups stages must be partition-count
invariant: every group key lives wholly inside one partition at ANY
modulus, so results cannot depend on the fan-out knob
(FTR_HASH_PARTS). Runs two window queries at two moduli and compares
canonicalized frames.
"""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("FTR_TEST_SF", "/root/testdata/sf0.001")


def _canon(res) -> pd.DataFrame:
    df = res.to_pandas() if hasattr(res, "to_pandas") else pd.DataFrame(res)
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("qname", ["events_cumsum", "events_rank",
                                   "user_first_last", "events_ntile",
                                   "events_range_frame",
                                   "events_dedup_latest",
                                   "time_weighted_avg",
                                   "interval_coverage",
                                   "max_drawdown",
                                   "event_markov"])
def test_result_invariant_under_fanout(ray_session, qname, monkeypatch):
    from freemap_tiler_ray.pipelines import queries as q

    fn = getattr(q, qname)
    monkeypatch.setattr(q, "_HASH_PARTS", 64)
    base = _canon(fn(SF_DIR))
    monkeypatch.setattr(q, "_HASH_PARTS", 5)
    alt = _canon(fn(SF_DIR))
    pd.testing.assert_frame_equal(base, alt)
