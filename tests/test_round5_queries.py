"""Property tests for the round-5 operators (beyond the oracle
equality in test_oracle_compare.py): structural invariants that would
stay true even if the oracle SQL had the same bug as the pipeline."""

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("FTR_TEST_SF", "/root/testdata/sf0.001")


def _df(res) -> pd.DataFrame:
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return pd.DataFrame(res)


def test_scd_intervals_partition_each_key_timeline(ray_session):
    from freemap_tiler_ray.pipelines.queries import scd_intervals

    df = _df(scd_intervals(SF_DIR)).sort_values(
        ["user_id", "event_type", "valid_from_us"])
    open_end = np.iinfo(np.int64).max
    for (_, _), g in df.groupby(["user_id", "event_type"]):
        vf = g["valid_from_us"].to_numpy()
        vt = g["valid_to_us"].to_numpy()
        # intervals chain: each valid_to is the next valid_from,
        # except the last, which is open
        assert (vt[:-1] == vf[1:]).all()
        assert vt[-1] == open_end
        assert (vt[:-1] > vf[:-1]).all()
        # consecutive intervals always change value (runs collapsed)
        vm = g["vm"].to_numpy()
        assert (vm[1:] != vm[:-1]).all()


def test_nearest_order_join_matches_bruteforce(ray_session):
    import pyarrow.parquet as papq

    from freemap_tiler_ray.pipelines.queries import nearest_order_join

    got = _df(nearest_order_join(SF_DIR)).sort_values(
        "event_id").reset_index(drop=True)

    ev = papq.read_table(
        f"{SF_DIR}/events.parquet",
        columns=["event_id", "user_id", "ts"]).to_pandas()
    od = papq.read_table(
        f"{SF_DIR}/orders.parquet",
        columns=["o_custkey", "o_orderdate"]).to_pandas()
    ev["us"] = ev["ts"].astype("int64")
    od["ous"] = od["o_orderdate"].astype("int64")
    by_user = {k: np.sort(g["ous"].to_numpy())
               for k, g in od.groupby("o_custkey")}
    rows = []
    for eid, uid, us in ev[["event_id", "user_id", "us"]].itertuples(
            index=False):
        o = by_user.get(uid)
        if o is None:
            continue
        d = np.abs(o - us)
        best = np.flatnonzero(d == d.min())[0]  # tie -> earliest order
        rows.append((eid, int(o[best]), int(d[best])))
    exp = pd.DataFrame(rows, columns=[
        "event_id", "nearest_order_us", "abs_dt_us"]).sort_values(
        "event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype("int64"),
                                  exp.astype("int64"))


def test_cell_clusters_labels_are_true_components(ray_session):
    """BFS closure check: two occupied cells share a label iff they are
    8-connected through occupied cells, and the label is the min id."""
    from freemap_tiler_ray.pipelines.queries import CELL_RES, cell_clusters

    G = 1 << CELL_RES
    df = _df(cell_clusters(SF_DIR))
    ids = (df["cell_x"].to_numpy() * G + df["cell_y"].to_numpy())
    label = dict(zip(ids.tolist(), df["cluster"].tolist()))
    occ = set(ids.tolist())
    seen: set[int] = set()
    for start in sorted(occ):
        if start in seen:
            continue
        comp, frontier = {start}, [start]
        while frontier:
            c = frontier.pop()
            cx, cy = divmod(c, G)
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    nx, ny = cx + dx, cy + dy
                    nid = nx * G + ny
                    if (0 <= nx < G and 0 <= ny < G
                            and nid in occ and nid not in comp):
                        comp.add(nid)
                        frontier.append(nid)
        seen |= comp
        want = min(comp)
        assert all(label[c] == want for c in comp)


def test_resume_cell_counts_equals_fresh(ray_session):
    from freemap_tiler_ray.pipelines.queries import (cell_counts,
                                                     resume_cell_counts)

    fresh = _df(cell_counts(SF_DIR)).sort_values(
        ["cell_x", "cell_y"]).reset_index(drop=True)
    resumed = _df(resume_cell_counts(SF_DIR)).sort_values(
        ["cell_x", "cell_y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(resumed.astype("int64"),
                                  fresh.astype("int64"))
