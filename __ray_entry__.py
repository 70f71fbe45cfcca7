"""Driver contract for the graft builder (Ray Data target).

entry(): flagship pipeline smoke over sf0.001.
queries(): one entry per implemented operator/pipeline (SURVEY.md §2 +
north-rule spatial/dedup/text/ANN layers), each sf_dir -> Dataset /
DataFrame / Table.
oracle_sql(): DuckDB-equivalent SQL per query, mirrored term-for-term
(hash arithmetic, float expression structure, tie-breaks) so the
driver's row-count + schema + value-hash compare passes exactly.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in freemap_tiler_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# SQL fragments mirroring freemap_tiler_ray.geo._mix32 / doc_lonlat
# (overflow-safe: every product < 2^63, DuckDB BIGINT raises on overflow)
# ---------------------------------------------------------------------------

_PTS_CTE = """
base AS (SELECT doc_id,
                doc_id % 4294967296 AS v0,
                (doc_id % 4294967296 + 1540483477) % 4294967296 AS w0
         FROM documents),
s1 AS (SELECT doc_id,
              (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1,
              (xor(w0 >> 16, w0) * 73244475) % 4294967296 AS w1 FROM base),
s2 AS (SELECT doc_id,
              (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2,
              (xor(w1 >> 16, w1) * 73244475) % 4294967296 AS w2 FROM s1),
pts AS (SELECT doc_id,
               -180.0 + (xor(v2 >> 16, v2) % 360000000) / 1000000.0 AS lon,
               -85.0  + (xor(w2 >> 16, w2) % 170000000) / 1000000.0 AS lat
        FROM s2)
"""

_ORIGIN = 20037508.342789244

# spans derivation mirror (FIXTURES.md F1 over int64 doc_id)
_SPANS_CTE = """
spans AS (
  SELECT d.doc_id, j,
         (['text','image','audio'])[((d.doc_id + j) % 3) + 1] AS kind,
         CASE WHEN ((d.doc_id + j) % 3) = 0
              THEN 't-' || d.doc_id || '-' || j ELSE '' END AS text,
         CASE WHEN ((d.doc_id + j) % 3) <> 0
              THEN 'm://' || d.doc_id || '/' || j ELSE '' END AS media_ref,
         j * 16 AS off
  FROM documents d, UNNEST(generate_series(0, (d.doc_id % 7)::INT)) AS t(j)
)
"""


def _tile_status_sql() -> str:
    """Closed-form pyramid status oracle for the fixture scene (anchor
    tile (4,9,5), 1024 px, disk radius 256 px): a tile at zoom>=4 has
    data iff its scene-pixel square intersects the disk; zooms<4 hold the
    whole scene. Mirrors tests/test_tiler_e2e.py::oracle_status."""
    return """
WITH g AS (SELECT unnest(generate_series(0, 3)) AS i),
zs AS (SELECT unnest([4, 5, 6]) AS z),
tiles AS (
  SELECT z,
         9 * (1 << (z - 4)) + gx.i AS x,
         5 * (1 << (z - 4)) + gy.i AS y,
         (1024 >> (z - 4)) AS scale,
         gx.i AS lx, gy.i AS ly
  FROM zs, g gx, g gy
  WHERE gx.i < (1 << (z - 4)) AND gy.i < (1 << (z - 4))
),
st AS (
  SELECT z AS zoom, x, y,
         CASE WHEN
           (LEAST(GREATEST(512, lx * scale), lx * scale + scale - 1) - 512)
           * (LEAST(GREATEST(512, lx * scale), lx * scale + scale - 1) - 512)
           + (LEAST(GREATEST(512, ly * scale), ly * scale + scale - 1) - 512)
           * (LEAST(GREATEST(512, ly * scale), ly * scale + scale - 1) - 512)
           < 65536
         THEN 'data' ELSE 'empty' END AS status
  FROM tiles
  UNION ALL SELECT * FROM (VALUES (3, 4, 2, 'data'), (2, 2, 1, 'data'),
                                  (1, 1, 0, 'data'), (0, 0, 0, 'data'))
)
"""


def _kmeans_sql(k: int = 8, iters: int = 5, dims: int = 64,
                final_select: str | None = None) -> str:
    """Exact mirror of stages.ann.kmeans: the 5 deterministic iterations
    unrolled as chained CTEs. Distances are left-folded over dims in
    both engines (numpy loop there, left-assoc '+' here) so float d2 is
    bit-identical; centroid updates are integer-scaled sums divided in
    the same order ((s / 1e6) / n); argmin ties break to lowest cluster
    id via ORDER BY d2, cluster."""
    ecols = ", ".join(f"CAST(embedding[{d + 1}] AS DOUBLE) AS e{d}"
                      for d in range(dims))
    parts = [f"ev AS (SELECT vec_id, {ecols} FROM embeddings)"]
    init = ", ".join(f"e{d} AS c{d}" for d in range(dims))
    parts.append(f"c0 AS (SELECT vec_id AS cluster, {init} FROM ev "
                 f"WHERE vec_id < {k})")
    d2 = "((v.e0 - c.c0) * (v.e0 - c.c0))"
    for d in range(1, dims):
        d2 = f"({d2} + ((v.e{d} - c.c{d}) * (v.e{d} - c.c{d})))"
    argmin = ("SELECT vec_id, cluster FROM (SELECT vec_id, cluster, "
              "row_number() OVER (PARTITION BY vec_id "
              "ORDER BY d2, cluster) AS rn FROM {src}) WHERE rn = 1")
    for i in range(iters):
        parts.append(f"d{i} AS (SELECT v.vec_id, c.cluster, {d2} AS d2 "
                     f"FROM ev v CROSS JOIN c{i} c)")
        parts.append(f"a{i} AS ({argmin.format(src=f'd{i}')})")
        scols = ", ".join(
            f"CAST(sum(CAST(floor(v.e{d} * 1000000.0) AS BIGINT)) "
            f"AS BIGINT) AS s{d}" for d in range(dims))
        parts.append(f"u{i} AS (SELECT a.cluster, {scols}, count(*) AS n "
                     f"FROM ev v JOIN a{i} a USING (vec_id) "
                     f"GROUP BY a.cluster)")
        ccols = ", ".join(
            f"COALESCE((CAST(u.s{d} AS DOUBLE) / 1000000.0) "
            f"/ CAST(u.n AS DOUBLE), p.c{d}) AS c{d}" for d in range(dims))
        parts.append(f"c{i + 1} AS (SELECT p.cluster, {ccols} "
                     f"FROM c{i} p LEFT JOIN u{i} u USING (cluster))")
    parts.append(f"df AS (SELECT v.vec_id, c.cluster, {d2} AS d2 "
                 f"FROM ev v CROSS JOIN c{iters} c)")
    parts.append(f"af AS ({argmin.format(src='df')})")
    return ("WITH " + ",\n".join(parts) + "\n" + (
        final_select or
        "SELECT CAST(cluster AS BIGINT) AS cluster, "
        "count(*) AS n_vecs FROM af GROUP BY cluster"))


def entry() -> Any:
    """Flagship: interleaved-doc spatial pipeline + a small pyramid build
    on sf0.001. Returns the PIP-join per-polygon counts DataFrame."""
    import os

    from freemap_tiler_ray.config import TilerConfig
    from freemap_tiler_ray.pipelines import queries as q
    from freemap_tiler_ray.pipelines.tiler import build_pyramid
    from freemap_tiler_ray.raster import make_scene

    sf = "/root/testdata/sf0.001"
    # spatial layer: spans (invariant-checked) + PIP join + kNN
    pip = q.pip_join(sf).to_pandas()
    q.spans_fp(sf).count()
    q.knn(sf).count()
    # small pyramid build (max_zoom 5 to keep the smoke fast)
    root = "/tmp/ftr_entry"
    os.makedirs(root, exist_ok=True)
    spec = make_scene(f"{root}/scene", anchor=(4, 9, 5), size=512,
                      bands=4, crs="EPSG:3857", disk_frac=0.25)
    build_pyramid(TilerConfig(scene_spec_path=spec.path,
                              out_dir=f"{root}/out", max_zoom=5,
                              warp_zoom_offset=2, resume=False))
    counts = (pip.groupby("poly_id", as_index=False)
                 .agg(n_docs=("doc_id", "count")))
    return counts


def _tile_queries():
    """Pyramid pipeline outputs as oracle-checkable tables (cached build
    under /tmp; sf-independent — the raster fixture is the input)."""
    import os

    def _built():
        from freemap_tiler_ray.config import TilerConfig
        from freemap_tiler_ray.pipelines.tiler import build_pyramid
        from freemap_tiler_ray.raster import make_scene

        root = "/tmp/ftr_query_cache"
        os.makedirs(root, exist_ok=True)
        spec = make_scene(f"{root}/scene", anchor=(4, 9, 5), size=1024,
                          bands=4, crs="EPSG:3857", disk_frac=0.25)
        cfg = TilerConfig(scene_spec_path=spec.path, out_dir=f"{root}/out",
                          max_zoom=6, warp_zoom_offset=3, resume=True)
        return build_pyramid(cfg), cfg

    def tile_pyramid_status(sf_dir: str):
        import ray.data as rd

        from freemap_tiler_ray.pipelines.tiler import parquet_files

        res, cfg = _built()
        return rd.read_parquet(parquet_files(res["tile_dirs"]),
                               columns=["zoom", "x", "y", "status"])

    def tile_limits(sf_dir: str):
        import pandas as pd

        res, _ = _built()
        rows = [{"zoom": z, **v} for z, v in sorted(res["limits"].items())]
        return pd.DataFrame(rows)

    return tile_pyramid_status, tile_limits


# The first 50 queries() keys — the exact set the round driver will
# check (it reads only the head-50). tests/test_driver_window.py pins
# queries() ordering against this tuple AND asserts the mechanical
# rotation invariant directly from the CORRECTNESS_r*.json artifacts:
# every registered query must either carry a driver row in some prior
# round or sit inside this window, so nothing can ship driver-unchecked
# for two rounds in a row.
DRIVER_WINDOW = (
    "time_rollup", "vocab_coverage", "bigram_novelty", "quality_audit",
    "max_drawdown", "ks_distance", "term_pmi", "link_predict", "containment_pairs",
    "chi2_drift", "digit_profile", "event_markov", "centroid_sims",
    "partition_balance", "dedup_survivorship", "langid_confusion",
    "degree_hist", "doc_commonness", "dedup_eval", "span_lang_stats",
    "assoc_rules", "hapax_share", "fulfillment_days", "burst_detect",
    "ann_recall_eval", "late_events", "revenue_contribution", "source_overlap",
    "backlog_curve", "median_gap", "events_dedup_latest", "value_percentiles",
    "q17_small_qty", "pagerank", "dedup_clusters", "anti_join_customers",
    "q3_shipping", "q10_returned_items", "q13_order_counts", "q18_top_customers",
    "nation_region_join", "scd_intervals", "nearest_order_join", "cell_clusters",
    "resume_cell_counts", "pip_join_spans", "events_asof", "embedding_pairs",
    "dedup_exact", "decontaminate",
)


def queries() -> dict[str, Callable[[str], Any]]:
    """Registered pipelines, ordered for the driver's correctness harness.

    The driver checks the FIRST 50 entries only, so the registry is
    rotated each round; DRIVER_WINDOW above pins the intended head-50
    and tests/test_driver_window.py fails on any misordered insert.

    Round-5 window composition (see DRIVER_WINDOW):
    - the 32 queries with no driver row in any prior round (the entire
      round-4 tail backlog, including events_dedup_latest and
      value_percentiles, which the round-4 rotation plan had missed) —
      with these green the cross-round union covers every registered
      query;
    - the 9 join-heavy sentinels displaced late in round 4
      (q17_small_qty, pagerank, dedup_clusters, anti_join_customers,
      q3_shipping, q10_returned_items, q13_order_counts,
      q18_top_customers, nation_region_join) — join internals changed
      in r4 and none of these has had a driver row since r2/r3;
    - the 4 round-5 additions (scd_intervals CDC compaction,
      nearest_order_join asof-NEAREST, cell_clusters spatial region
      labeling, resume_cell_counts crash/resume through the
      partitioned tabular sink), registered directly into the window
      so no new never-checked backlog forms;
    - 5 longest-unchecked distinct-kernel re-checks, all r2-green
      (pip_join_spans, events_asof, embedding_pairs, dedup_exact,
      decontaminate).

    Everything in the tail is driver-green in rounds 1-4 (the
    rotation test derives this from the CORRECTNESS artifacts) and
    runs against its oracle every pytest session.
    """
    from freemap_tiler_ray.pipelines import queries as q

    tile_pyramid_status, tile_limits = _tile_queries()
    reg = {
        # --- driver-checked window (first 50) == DRIVER_WINDOW ---
        # 32 never-driver-checked round-4 tail / session additions
        # (closing the cross-round union at 184/184):
        "time_rollup": q.time_rollup,
        "vocab_coverage": q.vocab_coverage,
        "bigram_novelty": q.bigram_novelty,
        "quality_audit": q.quality_audit,
        "max_drawdown": q.max_drawdown,
        "ks_distance": q.ks_distance,
        "term_pmi": q.term_pmi,
        "link_predict": q.link_predict,
        "containment_pairs": q.containment_pairs,
        "chi2_drift": q.chi2_drift,
        "digit_profile": q.digit_profile,
        "event_markov": q.event_markov,
        "centroid_sims": q.centroid_sims,
        "partition_balance": q.partition_balance,
        "dedup_survivorship": q.dedup_survivorship,
        "langid_confusion": q.langid_confusion,
        "degree_hist": q.degree_hist,
        "doc_commonness": q.doc_commonness,
        "dedup_eval": q.dedup_eval,
        "span_lang_stats": q.span_lang_stats,
        "assoc_rules": q.assoc_rules,
        "hapax_share": q.hapax_share,
        "fulfillment_days": q.fulfillment_days,
        "burst_detect": q.burst_detect,
        "ann_recall_eval": q.ann_recall_eval,
        "late_events": q.late_events,
        "revenue_contribution": q.revenue_contribution,
        "source_overlap": q.source_overlap,
        "backlog_curve": q.backlog_curve,
        "median_gap": q.median_gap,
        "events_dedup_latest": q.events_dedup_latest,
        "value_percentiles": q.value_percentiles,
        # 9 join-heavy sentinels, last driver-checked r2/r3 —
        # join internals were touched again in r4 (fan-out routing
        # + ray_patches hardening):
        "q17_small_qty": q.q17_small_qty,
        "pagerank": q.pagerank,
        "dedup_clusters": q.dedup_clusters,
        "anti_join_customers": q.anti_join_customers,
        "q3_shipping": q.q3_shipping,
        "q10_returned_items": q.q10_returned_items,
        "q13_order_counts": q.q13_order_counts,
        "q18_top_customers": q.q18_top_customers,
        "nation_region_join": q.nation_region_join,
        # round-5 additions (new operators, driver-checked in their
        # first round): SCD2 interval construction, asof-NEAREST
        # join, spatial region labeling, resumable-sink crash/resume
        # correctness at the query layer:
        "scd_intervals": q.scd_intervals,
        "nearest_order_join": q.nearest_order_join,
        "cell_clusters": q.cell_clusters,
        "resume_cell_counts": q.resume_cell_counts,
        # 5 longest-unchecked distinct-kernel re-checks (r2-green:
        # spatial span join, asof-backward join, embedding bucket
        # triangle, exact dedup, broadcast decontamination):
        "pip_join_spans": q.pip_join_spans,
        "events_asof": q.events_asof,
        "embedding_pairs": q.embedding_pairs,
        "dedup_exact": q.dedup_exact,
        "decontaminate": q.decontaminate,
        # --- tail: driver-green in rounds 1-4, still oracle-checked
        # every pytest session at three scales (COVERAGE.md) ---
        "active_customer_union": q.active_customer_union,
        "ordered_balance_intersect": q.ordered_balance_intersect,
        "dormant_customer_except": q.dormant_customer_except,
        "events_moving_avg": q.events_moving_avg,
        "corr_qty_price": q.corr_qty_price,
        "value_histogram": q.value_histogram,
        "embedding_pca": q.embedding_pca,
        "q21_last_shipper": q.q21_last_shipper,
        "q22_global_sales": q.q22_global_sales,
        "edit_distance_pairs": q.edit_distance_pairs,
        "pareto_front": q.pareto_front,
        "retention_cohorts": q.retention_cohorts,
        "q2_min_cost_supp": q.q2_min_cost_supp,
        "q20_excess_stock": q.q20_excess_stock,
        "triangle_count": q.triangle_count,
        "lineitem_melt": q.lineitem_melt,
        "order_lines_concat": q.order_lines_concat,
        "embedding_unnest": q.embedding_unnest,
        "lsh_pairs": q.lsh_pairs,
        "gap_fill_locf": q.gap_fill_locf,
        "quantile_normalize": q.quantile_normalize,
        "cell_smooth": q.cell_smooth,
        "mixture_sample": q.mixture_sample,
        "bloom_semi_join": q.bloom_semi_join,
        "dataset_split": q.dataset_split,
        "cell_pyramid": q.cell_pyramid,
        "weighted_median": q.weighted_median,
        "running_distinct": q.running_distinct,
        "normalize_text": q.normalize_text,
        "pii_redact": q.pii_redact,
        "kcore_nodes": q.kcore_nodes,
        "modality_balance": q.modality_balance,
        "ppjoin_pairs": q.ppjoin_pairs,
        "salted_type_stats": q.salted_type_stats,
        "caption_pairs": q.caption_pairs,
        "lang_regression": q.lang_regression,
        "sorted_neighbor_pairs": q.sorted_neighbor_pairs,
        "bfs_hops": q.bfs_hops,
        "ann_filtered": q.ann_filtered,
        "oov_rate": q.oov_rate,
        "events_range_frame": q.events_range_frame,
        "line_dedup": q.line_dedup,
        "zscore_outliers": q.zscore_outliers,
        "mad_outliers": q.mad_outliers,
        "time_weighted_avg": q.time_weighted_avg,
        "gini_by_source": q.gini_by_source,
        "modality_transitions": q.modality_transitions,
        "token_diversity": q.token_diversity,
        "grouped_topk_terms": q.grouped_topk_terms,
        "interval_coverage": q.interval_coverage,
        "spans_fp": q.spans_fp,
        "events_sliding": q.events_sliding,
        "events_range_join": q.events_range_join,
        "lang_quantiles": q.lang_quantiles,
        "tile_polygon_coverage": q.tile_polygon_coverage,
        "stratified_sample": q.stratified_sample,
        "weighted_sample": q.weighted_sample,
        "q6_filtered_revenue": q.q6_filtered_revenue,
        "events_props_json": q.events_props_json,
        "label_centroids": q.label_centroids,
        "q1_lineitem": q.q1_lineitem,
        "doc_cells": q.doc_cells,
        "cell_counts": q.cell_counts,
        "knn": q.knn,
        "media_features": q.media_features,
        "tile_zorder": q.tile_zorder,
        "revenue_by_segment": q.revenue_by_segment,
        "part_revenue_broadcast": q.part_revenue_broadcast,
        "topk_orders": q.topk_orders,
        "events_window": q.events_window,
        "events_sessions": q.events_sessions,
        "lang_id": q.lang_id,
        "winnow_pairs": q.winnow_pairs,
        "ann_topk": q.ann_topk,
        "ann_ivf": q.ann_ivf,
        "ann_lsh": q.ann_lsh,
        "kmeans_clusters": q.kmeans_clusters,
        "quality_scores": q.quality_scores,
        "tile_pyramid_status": tile_pyramid_status,
        "tile_limits": tile_limits,
        "q5_region_revenue": q.q5_region_revenue,
        "pii_scan": q.pii_scan,
        "events_lag": q.events_lag,
        "doc_chunks": q.doc_chunks,
        "pack_bins": q.pack_bins,
        "tfidf_topk": q.tfidf_topk,
        "user_sequences": q.user_sequences,
        "diverse_sample": q.diverse_sample,
        "kmv_distinct": q.kmv_distinct,
        "passage_dedup": q.passage_dedup,
        "q4_order_priority": q.q4_order_priority,
        "q12_priority_lines": q.q12_priority_lines,
        "rollup_revenue": q.rollup_revenue,
        "events_cumsum": q.events_cumsum,
        "q14_promo_share": q.q14_promo_share,
        "max_acctbal_per_nation": q.max_acctbal_per_nation,
        "events_rank": q.events_rank,
        "events_ntile": q.events_ntile,
        "type_user_counts": q.type_user_counts,
        "nation_activity_full_join": q.nation_activity_full_join,
        "top_event_type": q.top_event_type,
        "value_moments": q.value_moments,
        "embedding_quantize": q.embedding_quantize,
        "cube_revenue": q.cube_revenue,
        "user_first_last": q.user_first_last,
        "events_pivot": q.events_pivot,
        "q7_nation_volume": q.q7_nation_volume,
        "q8_market_share": q.q8_market_share,
        "q9_profit": q.q9_profit,
        "q11_important_suppliers": q.q11_important_suppliers,
        "q15_top_supplier": q.q15_top_supplier,
        "q16_supplier_cnt": q.q16_supplier_cnt,
        "q19_disjunctive": q.q19_disjunctive,
        "geo_pairs": q.geo_pairs,
        "events_hopping": q.events_hopping,
        "funnel_conversion": q.funnel_conversion,
        "top_terms": q.top_terms,
        "bigram_repetition": q.bigram_repetition,
        "ngram_pairs": q.ngram_pairs,
        "simhash_pairs": q.simhash_pairs,
        "pip_join": q.pip_join,
        "knn_ring": q.knn_ring,
        "sample_docs": q.sample_docs,
        "shuffle_docs": q.shuffle_docs,
        "winnow_fp": q.winnow_fp,
        "minhash_sigs": q.minhash_sigs,
        "simhash_sigs": q.simhash_sigs,
        "doc_points": q.doc_points,
        "distinct_lang_source": q.distinct_lang_source,
        "span_kind_stats": q.span_kind_stats,
        "docs_per_tile": q.docs_per_tile,
        "media_frames": q.media_frames,
        "text_stats": q.text_stats,
        "dup_spans": q.dup_spans,
    }
    head = list(reg)[:len(DRIVER_WINDOW)]
    assert head == list(DRIVER_WINDOW), (
        "queries() head does not match DRIVER_WINDOW — a new entry "
        "would ship driver-unchecked: " + repr(
            [(a, b) for a, b in zip(head, DRIVER_WINDOW) if a != b]))
    return reg


def oracle_sql() -> dict[str, str]:
    from freemap_tiler_ray.fixtures import polygon_sql_values, query_sql_values
    from freemap_tiler_ray.pipelines import queries as _q

    sqls: dict[str, str] = {}

    sqls["doc_points"] = f"WITH {_PTS_CTE} SELECT doc_id, lon, lat FROM pts"

    cell_expr = f"""
cells AS (
  SELECT doc_id,
    LEAST(GREATEST(CAST(floor((lon * ({_ORIGIN!r} / 180.0) + {_ORIGIN!r})
        / (2 * {_ORIGIN!r} / 64.0)) AS BIGINT), 0), 63) AS cell_x,
    LEAST(GREATEST(CAST(floor(({_ORIGIN!r} -
        ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)
        / (2 * {_ORIGIN!r} / 64.0)) AS BIGINT), 0), 63) AS cell_y
  FROM pts)
"""
    sqls["doc_cells"] = (f"WITH {_PTS_CTE}, {cell_expr} "
                         "SELECT doc_id, cell_x, cell_y FROM cells")
    sqls["cell_counts"] = (f"WITH {_PTS_CTE}, {cell_expr} "
                           "SELECT cell_x, cell_y, count(*) AS n_docs "
                           "FROM cells GROUP BY cell_x, cell_y")
    # 3x3 focal sum over the occupied cell grid (border neighbors
    # outside [0,63] dropped; occupied-only via HAVING on the center)
    sqls["cell_smooth"] = f"""
WITH {_PTS_CTE}, {cell_expr},
cc AS (SELECT cell_x, cell_y, count(*) AS n FROM cells GROUP BY 1, 2),
nb AS (SELECT cc.cell_x + dx.d AS tx, cc.cell_y + dy.d AS ty, cc.n,
              CASE WHEN dx.d = 0 AND dy.d = 0 THEN cc.n ELSE 0 END
                AS self_n
       FROM cc, (VALUES (-1), (0), (1)) dx(d),
            (VALUES (-1), (0), (1)) dy(d)
       WHERE cc.cell_x + dx.d BETWEEN 0 AND 63
         AND cc.cell_y + dy.d BETWEEN 0 AND 63)
SELECT tx AS cell_x, ty AS cell_y,
       CAST(sum(self_n) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS smooth_docs
FROM nb GROUP BY tx, ty HAVING sum(self_n) > 0
"""

    sqls["docs_per_tile"] = f"""
WITH {_PTS_CTE},
t AS (SELECT doc_id,
  LEAST(GREATEST(CAST(floor((lon * ({_ORIGIN!r} / 180.0) + {_ORIGIN!r})
      / (2 * {_ORIGIN!r} / 64.0)) AS BIGINT), 0), 63) AS tile_x,
  LEAST(GREATEST(CAST(floor(({_ORIGIN!r} -
      ln(tan((90.0 + lat) * (pi() / 360.0))) * 6378137.0)
      / (2 * {_ORIGIN!r} / 64.0)) AS BIGINT), 0), 63) AS tile_y
  FROM pts),
s AS (SELECT tile_x, tile_y,
  CASE WHEN tile_x BETWEEN 36 AND 39 AND tile_y BETWEEN 20 AND 23 THEN
    CASE WHEN
      (LEAST(GREATEST(512, (tile_x - 36) * 256), (tile_x - 36) * 256 + 255) - 512)
      * (LEAST(GREATEST(512, (tile_x - 36) * 256), (tile_x - 36) * 256 + 255) - 512)
      + (LEAST(GREATEST(512, (tile_y - 20) * 256), (tile_y - 20) * 256 + 255) - 512)
      * (LEAST(GREATEST(512, (tile_y - 20) * 256), (tile_y - 20) * 256 + 255) - 512)
      < 65536
    THEN 'data' ELSE 'empty' END
  ELSE 'outside' END AS status
  FROM t)
SELECT tile_x, tile_y, status, count(*) AS n_docs
FROM s GROUP BY tile_x, tile_y, status
"""

    sqls["spans_fp"] = f"""
WITH {_SPANS_CTE}
SELECT doc_id, count(*) AS n_spans,
       string_agg(kind || ':' || text || ':' || media_ref || ':' || off,
                  '|' ORDER BY j) AS spans_fp
FROM spans GROUP BY doc_id
"""
    sqls["span_kind_stats"] = (f"WITH {_SPANS_CTE} SELECT kind, count(*) AS n "
                               "FROM spans GROUP BY kind")

    sqls["pip_join"] = f"""
WITH {_PTS_CTE},
edges(poly_id, x1, y1, x2, y2) AS (VALUES {polygon_sql_values()})
SELECT p.doc_id, e.poly_id
FROM pts p CROSS JOIN edges e
GROUP BY p.doc_id, e.poly_id, p.lon, p.lat
HAVING sum(CASE WHEN ((e.y1 > p.lat) <> (e.y2 > p.lat))
                 AND (p.lon < (e.x2 - e.x1) * (p.lat - e.y1)
                              / (e.y2 - e.y1) + e.x1)
            THEN 1 ELSE 0 END) % 2 = 1
"""

    sqls["knn"] = f"""
WITH {_PTS_CTE},
qs(query_id, qlon, qlat) AS (VALUES {query_sql_values()}),
d AS (SELECT q.query_id, p.doc_id,
             (p.lon - q.qlon) * (p.lon - q.qlon)
             + (p.lat - q.qlat) * (p.lat - q.qlat) AS d2
      FROM qs q CROSS JOIN pts p),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY d2, doc_id) AS rank FROM d)
SELECT query_id, doc_id, d2, rank FROM r WHERE rank <= 5
"""
    # the cell-ring kNN variant is result-identical to brute force
    sqls["knn_ring"] = sqls["knn"]

    sqls["media_features"] = f"""
WITH {_SPANS_CTE},
m AS (SELECT doc_id, j AS span_idx, media_ref,
             (doc_id * 31 + j) % 4294967296 AS v0
      FROM spans WHERE kind <> 'text'),
h1 AS (SELECT *, (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM m),
h2 AS (SELECT *, (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM h1),
h AS (SELECT doc_id, span_idx, media_ref, xor(v2 >> 16, v2) AS hv FROM h2)
SELECT doc_id, span_idx, media_ref,
       16 + hv % 4096 AS width, 16 + (hv >> 12) % 4096 AS height
FROM h
"""

    # monetary sums are floor-scaled to integers: float sums are not
    # associative, so only integer sums can value-match across engines
    sqls["media_frames"] = f"""
WITH {_SPANS_CTE},
a AS (SELECT doc_id, j AS span_idx,
             (doc_id * 31 + j) % 4294967296 AS v0
      FROM spans WHERE kind = 'audio'),
h1 AS (SELECT *, (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM a),
h2 AS (SELECT *, (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM h1),
h AS (SELECT doc_id, span_idx,
             1 + xor(v2 >> 16, v2) % 4 AS n_frames FROM h2)
SELECT doc_id, span_idx, f.f AS frame, f.f * 250 AS offset_ms
FROM h, UNNEST(generate_series(0, (h.n_frames - 1)::INT)) AS f(f)
"""

    # outer aggregates CAST to BIGINT: DuckDB widens sum(BIGINT) to
    # HUGEINT, which pandas converts to float64 and breaks the driver's
    # dtype-sensitive value hash even when values are bit-exact
    sqls["q1_lineitem"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 10000.0)
                AS BIGINT)) AS BIGINT) AS sum_disc_price_e4,
       count(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""
    sqls["revenue_by_segment"] = """
SELECT c_mktsegment,
       CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS revenue_e2,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""
    sqls["part_revenue_broadcast"] = """
SELECT p_brand,
       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 10000.0)
                AS BIGINT)) AS BIGINT) AS revenue_e4
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""
    sqls["anti_join_customers"] = """
SELECT c_custkey, c_name, c_mktsegment FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""
    sqls["q3_shipping"] = """
WITH rev AS (
  SELECT l_orderkey,
         CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount))
                             * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_e4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON c_custkey = o_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1997-06-01'
    AND l_shipdate > TIMESTAMP '1997-06-01'
  GROUP BY l_orderkey)
SELECT r.l_orderkey, r.revenue_e4,
       epoch_us(o.o_orderdate) AS o_odate_us, o.o_orderpriority
FROM rev r JOIN orders o ON o.o_orderkey = r.l_orderkey
ORDER BY r.revenue_e4 DESC, r.l_orderkey LIMIT 10
"""
    sqls["topk_orders"] = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""
    sqls["events_window"] = """
SELECT event_type, epoch_us(ts) // 3600000000 AS window_id,
       count(*) AS n_events, min(value) AS min_value, max(value) AS max_value
FROM events GROUP BY event_type, window_id
"""
    sqls["events_sessions"] = """
WITH e AS (SELECT user_id, epoch_us(ts) AS us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)) AS prev
           FROM events)
SELECT user_id,
       CAST(1 + sum(CASE WHEN prev IS NOT NULL AND us - prev > 1800000000
               THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM e GROUP BY user_id
"""

    # morton interleave of 6-bit coords, mirrored bit-by-bit
    mx = " + ".join(f"(((x >> {b}) & 1) << {2 * b})" for b in range(6))
    my = " + ".join(f"(((y >> {b}) & 1) << {2 * b + 1})" for b in range(6))
    sqls["tile_zorder"] = f"""
WITH g AS (SELECT unnest(generate_series(0, 15)) AS i),
t AS (SELECT 36 + (i % 4) AS x, 20 + (i // 4) AS y FROM g)
SELECT x, y, {mx} + {my} AS morton FROM t
"""

    sqls["pip_join_spans"] = f"""
WITH {_PTS_CTE},
edges(poly_id, x1, y1, x2, y2) AS (VALUES {polygon_sql_values()}),
hits AS (
  SELECT p.doc_id, e.poly_id
  FROM pts p CROSS JOIN edges e
  GROUP BY p.doc_id, e.poly_id, p.lon, p.lat
  HAVING sum(CASE WHEN ((e.y1 > p.lat) <> (e.y2 > p.lat))
                   AND (p.lon < (e.x2 - e.x1) * (p.lat - e.y1)
                                / (e.y2 - e.y1) + e.x1)
              THEN 1 ELSE 0 END) % 2 = 1)
SELECT doc_id, poly_id, (doc_id % 7) + 1 AS n_spans FROM hits
"""

    sqls["events_asof"] = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
o AS (SELECT o_custkey, epoch_us(o_orderdate) AS us FROM orders)
SELECT e.event_id, max(o.us) AS last_order_us
FROM e JOIN o ON o.o_custkey = e.user_id AND o.us <= e.us
GROUP BY e.event_id
"""

    from freemap_tiler_ray.pipelines.queries import RANGE_JOIN_WINDOW_US
    sqls["events_range_join"] = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
o AS (SELECT o_custkey, epoch_us(o_orderdate) AS us FROM orders)
SELECT e.event_id, CAST(count(o.us) AS BIGINT) AS n_orders
FROM e LEFT JOIN o ON o.o_custkey = e.user_id
   AND o.us BETWEEN e.us - {RANGE_JOIN_WINDOW_US} AND e.us
GROUP BY e.event_id
"""

    sqls["q6_filtered_revenue"] = """
SELECT CAST(sum(CAST(floor((l_extendedprice * l_discount) * 10000.0)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       count(*) AS n_rows
FROM lineitem
WHERE l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07
"""
    sqls["nation_region_join"] = """
SELECT r_name, count(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""
    sqls["events_props_json"] = """
WITH p AS (SELECT CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)
             AS k FROM events)
SELECT k % 10 AS k_bucket, count(*) AS n,
       min(k) AS min_k, max(k) AS max_k
FROM p GROUP BY k_bucket
"""
    sqls["label_centroids"] = """
SELECT CAST(label AS BIGINT) AS label, CAST(d.d AS BIGINT) AS dim,
       CAST(sum(CAST(floor(CAST(embedding[d.d + 1] AS DOUBLE) * 1000000.0)
                AS BIGINT)) AS BIGINT) AS sum_e6,
       count(*) AS n_vecs
FROM embeddings, (SELECT unnest(generate_series(0, 63)) AS d) d
GROUP BY label, dim
"""

    # tile_polygon_coverage: full rect-intersects-polygon predicate,
    # mirrored part-by-part (vertex-in-rect, corner-in-polygon via ray
    # casting, edge-vs-rect separating-axis test — division-free)
    from freemap_tiler_ray.fixtures import pip_polygons as _pp
    _ring7 = dict(_pp())["poly-07"]
    _vals = []
    for _j in range(len(_ring7)):
        _x1, _y1 = _ring7[_j]
        _x2, _y2 = _ring7[(_j + 1) % len(_ring7)]
        from freemap_tiler_ray.fixtures import _d as _dd
        _vals.append(f"({_dd(_x1)},{_dd(_y1)},{_dd(_x2)},{_dd(_y2)})")
    _edges = ",".join(_vals)

    def _cross_sum(px, py):
        return f"""(SELECT sum(CASE WHEN ((e.y1 > {py}) <> (e.y2 > {py}))
                 AND ({px} < (e.x2 - e.x1) * ({py} - e.y1)
                              / (e.y2 - e.y1) + e.x1)
            THEN 1 ELSE 0 END) FROM edges e) % 2 = 1"""

    _corner_checks = " OR ".join(
        _cross_sum(cx, cy) for cx, cy in
        [("t.rx0", "t.ry0"), ("t.rx0", "t.ry1"),
         ("t.rx1", "t.ry0"), ("t.rx1", "t.ry1")])
    sqls["tile_polygon_coverage"] = f"""
WITH edges(x1, y1, x2, y2) AS (VALUES {_edges}),
g AS (SELECT unnest(generate_series(0, 4095)) AS i),
t AS (SELECT i % 64 AS x, i // 64 AS y,
             -180.0 + (i % 64) * (360.0 / 64.0) AS rx0,
             -180.0 + ((i % 64) + 1) * (360.0 / 64.0) AS rx1,
             -90.0 + (i // 64) * (180.0 / 64.0) AS ry0,
             -90.0 + ((i // 64) + 1) * (180.0 / 64.0) AS ry1
      FROM g)
SELECT x, y FROM t
WHERE
  EXISTS (SELECT 1 FROM edges e
          WHERE e.x1 >= t.rx0 AND e.x1 <= t.rx1
            AND e.y1 >= t.ry0 AND e.y1 <= t.ry1)
  OR ({_corner_checks})
  OR EXISTS (
    SELECT 1 FROM edges e
    WHERE GREATEST(e.x1, e.x2) >= t.rx0 AND LEAST(e.x1, e.x2) <= t.rx1
      AND GREATEST(e.y1, e.y2) >= t.ry0 AND LEAST(e.y1, e.y2) <= t.ry1
      AND NOT (
        ((e.x2 - e.x1) * (t.ry0 - e.y1) - (e.y2 - e.y1) * (t.rx0 - e.x1) > 0)
        AND ((e.x2 - e.x1) * (t.ry1 - e.y1) - (e.y2 - e.y1) * (t.rx0 - e.x1) > 0)
        AND ((e.x2 - e.x1) * (t.ry0 - e.y1) - (e.y2 - e.y1) * (t.rx1 - e.x1) > 0)
        AND ((e.x2 - e.x1) * (t.ry1 - e.y1) - (e.y2 - e.y1) * (t.rx1 - e.x1) > 0))
      AND NOT (
        ((e.x2 - e.x1) * (t.ry0 - e.y1) - (e.y2 - e.y1) * (t.rx0 - e.x1) < 0)
        AND ((e.x2 - e.x1) * (t.ry1 - e.y1) - (e.y2 - e.y1) * (t.rx0 - e.x1) < 0)
        AND ((e.x2 - e.x1) * (t.ry0 - e.y1) - (e.y2 - e.y1) * (t.rx1 - e.x1) < 0)
        AND ((e.x2 - e.x1) * (t.ry1 - e.y1) - (e.y2 - e.y1) * (t.rx1 - e.x1) < 0))
  )
"""

    sqls["sample_docs"] = """
WITH b AS (SELECT doc_id, lang,
                  (doc_id % 4294967296 + 777) % 4294967296 AS v0
           FROM documents),
s1 AS (SELECT doc_id, lang,
              (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM b),
s2 AS (SELECT doc_id, lang,
              (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM s1)
SELECT doc_id, lang FROM s2 WHERE xor(v2 >> 16, v2) % 100 < 10
"""
    from freemap_tiler_ray.pipelines.queries import STRATA_K
    sqls["stratified_sample"] = f"""
WITH b AS (SELECT doc_id, lang,
                  (doc_id % 4294967296 + 777) % 4294967296 AS v0
           FROM documents),
s1 AS (SELECT doc_id, lang,
              (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM b),
s2 AS (SELECT doc_id, lang,
              (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM s1),
h AS (SELECT doc_id, lang, xor(v2 >> 16, v2) AS hv FROM s2),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY hv, doc_id) AS rn
      FROM h)
SELECT doc_id, lang FROM r WHERE rn <= {STRATA_K}
"""

    from freemap_tiler_ray.pipelines.queries import WEIGHTED_SAMPLE_W
    sqls["weighted_sample"] = f"""
WITH b AS (SELECT doc_id, lang, n_chars,
                  (doc_id % 4294967296 + 777) % 4294967296 AS v0
           FROM documents),
s1 AS (SELECT doc_id, lang, n_chars,
              (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM b),
s2 AS (SELECT doc_id, lang, n_chars,
              (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM s1)
SELECT doc_id, lang, n_chars FROM s2
WHERE xor(v2 >> 16, v2) % 1000000 < n_chars * {WEIGHTED_SAMPLE_W}
"""

    sqls["lang_quantiles"] = """
SELECT lang,
       quantile_cont(length(string_split(text, ' ')), 0.5) AS p50_tokens,
       quantile_cont(length(string_split(text, ' ')), 0.9) AS p90_tokens
FROM documents GROUP BY lang
"""

    sqls["distinct_lang_source"] = \
        "SELECT DISTINCT lang, source FROM documents"
    sqls["shuffle_docs"] = "SELECT doc_id, lang FROM documents"
    sqls["events_sliding"] = """
SELECT event_id,
       count(*) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         AS n_window
FROM events
"""

    # ---- text analysis ----
    _TOKS = "string_split(text, ' ')"
    sqls["text_stats"] = f"""
SELECT doc_id,
  length(text) AS n_chars_calc,
  length({_TOKS}) AS n_tokens,
  length(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
    AS n_bpe_tokens,
  length(list_distinct({_TOKS})) AS n_unique,
  CAST(length(list_distinct({_TOKS})) AS DOUBLE)
    / CAST(length({_TOKS}) AS DOUBLE) AS uniq_ratio,
  CAST(length(list_filter({_TOKS},
       t -> t IN ('the','a','of','and','is'))) AS DOUBLE)
    / CAST(length({_TOKS}) AS DOUBLE) AS stop_ratio
FROM documents
"""
    _MK = {"en": "('the','a','of','and','is')",
           "de": "('der','die','das','und','ist')",
           "fr": "('le','la','les','et','est')"}
    sqls["lang_id"] = f"""
WITH s AS (
  SELECT doc_id,
    length(list_filter({_TOKS}, t -> t IN {_MK['en']})) AS en_score,
    length(list_filter({_TOKS}, t -> t IN {_MK['de']})) AS de_score,
    length(list_filter({_TOKS}, t -> t IN {_MK['fr']})) AS fr_score
  FROM documents)
SELECT doc_id, en_score, de_score, fr_score,
  CASE WHEN en_score >= de_score AND en_score >= fr_score AND en_score > 0
       THEN 'en'
       WHEN de_score >= fr_score AND de_score > 0 THEN 'de'
       WHEN fr_score > 0 THEN 'fr' ELSE 'und' END AS lang_pred
FROM s
"""
    from freemap_tiler_ray.stages.text import FP_B, FP_K, FP_P, FP_W
    horner = "CAST(unicode(substr(text, i, 1)) AS BIGINT)"
    for _j in range(1, FP_K):
        horner = (f"(({horner}) * {FP_B} + "
                  f"unicode(substr(text, i+{_j}, 1))) % {FP_P}")
    sqls["winnow_fp"] = f"""
WITH p AS (
  SELECT doc_id, text, length(text) AS n,
         unnest(generate_series(1, length(text) - {FP_K - 1})) AS i
  FROM documents
), h AS (
  SELECT doc_id, i, {horner} AS hv, n FROM p
), w AS (
  SELECT doc_id, i, n,
    min(hv) OVER (PARTITION BY doc_id ORDER BY i
                  ROWS BETWEEN CURRENT ROW AND {FP_W - 1} FOLLOWING) AS fp
  FROM h)
SELECT DISTINCT doc_id, fp FROM w WHERE i <= n - {FP_K + FP_W - 2}
"""

    from freemap_tiler_ray.stages.dedup import (WINNOW_MAXDF,
                                                WINNOW_MIN_SHARED)
    sqls["winnow_pairs"] = f"""
WITH w AS ({sqls['winnow_fp']}),
rare AS (SELECT fp FROM w GROUP BY fp HAVING count(*) <= {WINNOW_MAXDF}),
wr AS (SELECT w.doc_id, w.fp FROM w JOIN rare USING (fp))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM wr a JOIN wr b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {WINNOW_MIN_SHARED}
"""

    sqls["dedup_exact"] = """
SELECT md5(lower(trim(text))) AS fingerprint,
       min(doc_id) AS keep_doc_id, count(*) AS n_docs
FROM documents GROUP BY fingerprint
"""

    from freemap_tiler_ray.pipelines.queries import (BIGRAM_REP_DEN,
                                                     BIGRAM_REP_NUM,
                                                     DECON_TEST_MOD,
                                                     TOP_TERMS_DF_DEN,
                                                     TOP_TERMS_DF_NUM,
                                                     TOP_TERMS_K)
    _SH_ONLY = """
sh AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM (
    SELECT d.doc_id,
           CASE WHEN length(string_split(d.text,' ')) < 3 THEN d.text
                ELSE array_to_string(
                       list_slice(string_split(d.text,' '), i, i + 2), ' ')
           END AS s
    FROM documents d,
         UNNEST(generate_series(
           1, GREATEST(length(string_split(d.text,' ')) - 2, 1))) AS g(i))
)"""
    sqls["decontaminate"] = f"""
WITH {_SH_ONLY},
test AS (SELECT DISTINCT h FROM sh WHERE doc_id % {DECON_TEST_MOD} = 0)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM sh s JOIN test USING (h)
WHERE s.doc_id % {DECON_TEST_MOD} <> 0
GROUP BY s.doc_id
"""

    sqls["top_terms"] = f"""
WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
             FROM documents),
agg AS (SELECT lang, tok, CAST(count(*) AS BIGINT) AS tf,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tok GROUP BY lang, tok),
ld AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
r AS (SELECT a.lang, a.tok, a.tf, a.df,
             row_number() OVER (PARTITION BY a.lang
                                ORDER BY a.tf DESC, a.tok) AS rn
      FROM agg a JOIN ld USING (lang)
      WHERE a.df * {TOP_TERMS_DF_DEN} <= ld.n_docs * {TOP_TERMS_DF_NUM})
SELECT lang, tok, tf, df FROM r WHERE rn <= {TOP_TERMS_K}
"""

    sqls["bigram_repetition"] = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
           WHERE length(string_split(text, ' ')) >= 2),
bg AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + 1), ' ') AS s
       FROM t, UNNEST(generate_series(1, length(toks) - 1)) AS g(i)),
cnt AS (SELECT doc_id, s, count(*) AS c FROM bg GROUP BY doc_id, s),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
               CAST(max(c) AS BIGINT) AS top_count
        FROM cnt GROUP BY doc_id)
SELECT doc_id, n_bigrams, top_count,
       CAST(top_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS rep_frac
FROM tot
WHERE top_count * {BIGRAM_REP_DEN} >= n_bigrams * {BIGRAM_REP_NUM}
"""

    # ---- shingle/minhash dedup family ----
    from freemap_tiler_ray.stages.dedup import (EMBED_COS_TAU, JACCARD_TAU,
                                                LSH_ROWS_PER_BAND,
                                                MINHASH_MOD,
                                                NGRAM_JACCARD_TAU,
                                                SIMHASH_MAX_HAMMING,
                                                minhash_params)
    a_p, b_p = minhash_params()
    perms_values = ",".join(f"({p},{int(a_p[p])},{int(b_p[p])})"
                            for p in range(len(a_p)))
    _SH_CTE = f"""
sh AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
  FROM (
    SELECT d.doc_id,
           CASE WHEN length(string_split(d.text,' ')) < 3 THEN d.text
                ELSE array_to_string(
                       list_slice(string_split(d.text,' '), i, i + 2), ' ')
           END AS s
    FROM documents d,
         UNNEST(generate_series(
           1, GREATEST(length(string_split(d.text,' ')) - 2, 1))) AS g(i))
),
perms(p, a, b) AS (VALUES {perms_values}),
sigs AS (
  SELECT doc_id, CAST(p.p AS BIGINT) AS perm,
         min((p.a * (h % {MINHASH_MOD}) + p.b) % {MINHASH_MOD}) AS minhash
  FROM sh, perms p GROUP BY doc_id, p.p)
"""
    sqls["minhash_sigs"] = (f"WITH {_SH_CTE} "
                            "SELECT doc_id, perm, minhash FROM sigs")

    _JACCARD_TAIL = """
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c
  JOIN sh x ON x.doc_id = c.doc_a
  JOIN sh y ON y.doc_id = c.doc_b AND y.h = x.h
  GROUP BY c.doc_a, c.doc_b),
jac AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.i AS DOUBLE) / CAST(ca.n + cb.n - i.i AS DOUBLE) AS jaccard
  FROM inter i
  JOIN cnt ca ON ca.doc_id = i.doc_a
  JOIN cnt cb ON cb.doc_id = i.doc_b)
"""
    _LSH_CHAIN = f"""{_SH_CTE},
bands AS (
  SELECT doc_id, perm // {LSH_ROWS_PER_BAND} AS band,
         string_agg(minhash::VARCHAR, '-' ORDER BY perm) AS sig
  FROM sigs GROUP BY doc_id, band),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
{_JACCARD_TAIL}"""
    sqls["lsh_pairs"] = f"""
WITH {_LSH_CHAIN}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {JACCARD_TAU!r}
"""
    # near-dup clusters: transitive closure (min reachable doc id) over
    # the LSH pair graph — mirrors stages.dedup.connected_components
    sqls["dedup_clusters"] = f"""
WITH RECURSIVE {_LSH_CHAIN},
p AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {JACCARD_TAU!r}),
e(src, dst) AS (SELECT doc_a, doc_b FROM p
                UNION ALL SELECT doc_b, doc_a FROM p),
reach(doc, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN e ON e.src = r.doc)
SELECT doc AS doc_id, CAST(min(lab) AS BIGINT) AS cluster
FROM reach GROUP BY doc
"""
    sqls["ngram_pairs"] = f"""
WITH {_SH_CTE},
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id),
{_JACCARD_TAIL}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {NGRAM_JACCARD_TAU!r}
"""
    # PPJoin differs only in candidate generation (prefix filter),
    # which the exact-verify pass makes invisible to the result: the
    # oracle is the plain all-shared-shingle candidate set at its tau.
    from freemap_tiler_ray.stages.dedup import PPJOIN_TAU
    sqls["ppjoin_pairs"] = f"""
WITH {_SH_CTE},
cand AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id),
{_JACCARD_TAIL}
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {PPJOIN_TAU!r}
"""
    sqls["modality_balance"] = f"""
WITH {_SPANS_CTE}
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(CASE WHEN kind = 'text' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_text,
       CAST(sum(CASE WHEN kind <> 'text' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_media,
       CAST(sum(CASE WHEN kind = 'text' THEN length(text) ELSE 0 END)
            AS BIGINT) AS text_chars,
       CAST(sum(CASE WHEN kind <> 'text'
                     THEN (doc_id * 31 + j * 17) % 4096 + 256
                     ELSE 0 END) AS BIGINT) AS media_bytes
FROM spans GROUP BY doc_id
"""
    # nearest-preceding-text caption mining over the spans table:
    # LOCF window (MAX of text-span j over the preceding frame)
    sqls["caption_pairs"] = f"""
WITH {_SPANS_CTE},
locf AS (
  SELECT doc_id, j, kind, media_ref,
         MAX(CASE WHEN kind = 'text' THEN j END)
           OVER (PARTITION BY doc_id ORDER BY j
                 ROWS UNBOUNDED PRECEDING) AS cap_j
  FROM spans)
SELECT doc_id, CAST(j AS BIGINT) AS j, media_ref,
       't-' || doc_id || '-' || cap_j AS caption,
       CAST(j - cap_j AS BIGINT) AS gap
FROM locf WHERE kind <> 'text' AND cap_j IS NOT NULL
"""
    # per-language OLS of n_chars on token count from integer-exact
    # sufficient statistics; the float expression tree matches the Ray
    # finish op-for-op (one rounding per int->double cast, identical
    # division order), so the doubles are bit-identical
    sqls["lang_regression"] = """
WITH d AS (SELECT lang,
                  CAST(length(text) - length(replace(text, ' ', '')) + 1
                       AS BIGINT) AS x,
                  CAST(n_chars AS BIGINT) AS y
           FROM documents),
s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM d GROUP BY lang)
SELECT lang, n,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept,
       (CAST(n * sxy - sx * sy AS DOUBLE)
        * CAST(n * sxy - sx * sy AS DOUBLE))
         / (CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE)) AS r2
FROM s
"""
    # sorted-neighborhood blocking: every pair within SNM_W positions
    # of the global (n_chars, doc_id) order
    sqls["sorted_neighbor_pairs"] = f"""
WITH r AS (SELECT doc_id, n_chars,
                  row_number() OVER (ORDER BY n_chars, doc_id) AS rn
           FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS BIGINT) AS gap,
       CAST(b.n_chars - a.n_chars AS BIGINT) AS len_diff
FROM r a JOIN r b
  ON b.rn > a.rn AND b.rn <= a.rn + {_q.SNM_W}
"""
    sqls["events_dedup_latest"] = """
WITH v AS (SELECT user_id, event_type, event_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC)
                    AS rn
           FROM events)
SELECT user_id, event_type, event_id AS last_event_id,
       CAST(epoch_us(ts) AS BIGINT) AS last_ts_us, vm AS last_vm
FROM v WHERE rn = 1
"""
    sqls["value_percentiles"] = """
WITH v AS (SELECT event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
h AS (SELECT event_type, vm, count(*) AS c FROM v GROUP BY 1, 2),
cum AS (SELECT event_type, vm,
               sum(c) OVER (PARTITION BY event_type ORDER BY vm) AS cc,
               sum(c) OVER (PARTITION BY event_type) AS n
        FROM h)
SELECT event_type, CAST(min(n) AS BIGINT) AS n,
       CAST(min(CASE WHEN 4 * cc >= n THEN vm END) AS BIGINT) AS p25_milli,
       CAST(min(CASE WHEN 2 * cc >= n THEN vm END) AS BIGINT) AS p50_milli,
       CAST(min(CASE WHEN 4 * cc >= 3 * n THEN vm END) AS BIGINT)
         AS p75_milli
FROM cum GROUP BY event_type
"""
    sqls["salted_type_stats"] = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT) AS s_milli
FROM events GROUP BY event_type
"""
    # non-overlapping 8-token lines; a line in >= 2 distinct docs is
    # boilerplate and dropped from the per-doc view
    sqls["line_dedup"] = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tk,
         generate_subscripts(string_split(text, ' '), 1) AS ord
  FROM documents),
lines AS (
  SELECT doc_id, (ord - 1) // 8 AS line_no,
         string_agg(tk, ' ' ORDER BY ord) AS passage
  FROM tok GROUP BY doc_id, (ord - 1) // 8),
freq AS (
  SELECT passage, count(DISTINCT doc_id) AS ndocs
  FROM lines GROUP BY passage)
SELECT l.doc_id,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN f.ndocs < 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(sum(CASE WHEN f.ndocs < 2 THEN length(l.passage) ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM lines l JOIN freq f USING (passage)
GROUP BY l.doc_id
"""
    sqls["zscore_outliers"] = """
WITH st AS (SELECT lang, CAST(count(*) AS HUGEINT) AS n,
                   CAST(sum(n_chars) AS HUGEINT) AS s,
                   sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
            FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN st USING (lang)
WHERE (CAST(d.n_chars AS HUGEINT) * st.n - st.s)
      * (CAST(d.n_chars AS HUGEINT) * st.n - st.s)
      > 4 * (st.n * st.q - st.s * st.s)
"""
    sqls["mad_outliers"] = """
WITH h AS (SELECT lang, n_chars AS v, count(*) AS c
           FROM documents GROUP BY 1, 2),
medc AS (SELECT lang, v,
                2 * sum(c) OVER (PARTITION BY lang ORDER BY v) AS cc2,
                sum(c) OVER (PARTITION BY lang) AS n
         FROM h),
med AS (SELECT lang, min(v) AS m FROM medc WHERE cc2 >= n
        GROUP BY lang),
dh AS (SELECT h.lang, abs(h.v - med.m) AS d, sum(h.c) AS c
       FROM h JOIN med USING (lang) GROUP BY h.lang, abs(h.v - med.m)),
madc AS (SELECT lang, d,
                2 * sum(c) OVER (PARTITION BY lang ORDER BY d) AS cc2,
                sum(c) OVER (PARTITION BY lang) AS n
         FROM dh),
mad AS (SELECT lang, min(d) AS mad FROM madc WHERE cc2 >= n
        GROUP BY lang)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN med USING (lang) JOIN mad USING (lang)
WHERE abs(d.n_chars - med.m) > 2 * mad.mad
"""
    sqls["time_weighted_avg"] = """
WITH v AS (SELECT user_id, event_id,
                  CAST(epoch_us(ts) AS BIGINT) AS ts_us,
                  CAST(floor(value * 1000) AS BIGINT) AS vm
           FROM events),
w AS (SELECT user_id, vm, ts_us,
             lead(ts_us) OVER (PARTITION BY user_id
                               ORDER BY ts_us, event_id) AS nxt
      FROM v)
SELECT user_id,
       CAST(coalesce(sum(vm * ((nxt - ts_us) // 1000000)), 0) AS BIGINT)
         AS twa_num,
       CAST(coalesce(sum((nxt - ts_us) // 1000000), 0) AS BIGINT)
         AS twa_den,
       CAST(count(*) AS BIGINT) AS n_events
FROM w GROUP BY user_id
"""
    sqls["modality_transitions"] = f"""
WITH {_SPANS_CTE},
tr AS (SELECT doc_id, (kind = 'text') AS a,
              lead(kind = 'text') OVER (PARTITION BY doc_id
                                        ORDER BY j) AS b
       FROM spans)
SELECT doc_id,
  CAST(sum(CASE WHEN b IS NOT NULL AND a AND b THEN 1 ELSE 0 END)
       AS BIGINT) AS n_tt,
  CAST(sum(CASE WHEN b IS NOT NULL AND a AND NOT b THEN 1 ELSE 0 END)
       AS BIGINT) AS n_tm,
  CAST(sum(CASE WHEN b IS NOT NULL AND NOT a AND b THEN 1 ELSE 0 END)
       AS BIGINT) AS n_mt,
  CAST(sum(CASE WHEN b IS NOT NULL AND NOT a AND NOT b THEN 1 ELSE 0
           END) AS BIGINT) AS n_mm
FROM tr GROUP BY doc_id
"""
    sqls["interval_coverage"] = """
WITH iv AS (SELECT user_id, event_id,
                   CAST(epoch_us(ts) // 1000000 AS BIGINT) AS s,
                   CAST(epoch_us(ts) // 1000000
                        + ((CAST(floor(value * 1000) AS BIGINT) % 3600)
                           + 3600) % 3600 AS BIGINT) AS e
            FROM events),
w AS (SELECT user_id, s, e,
             max(e) OVER (PARTITION BY user_id
                          ORDER BY s, e, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS prev
      FROM iv)
SELECT user_id,
       CAST(sum(greatest(e - greatest(s, coalesce(prev, -1)), 0))
            AS BIGINT) AS covered_s,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM w GROUP BY user_id
"""
    sqls["grouped_topk_terms"] = """
WITH tok AS (SELECT lang, unnest(string_split(text, ' ')) AS tk
             FROM documents),
c AS (SELECT lang, tk, count(*) AS c FROM tok GROUP BY 1, 2),
r AS (SELECT lang, tk AS tok, CAST(c AS BIGINT) AS tf,
             row_number() OVER (PARTITION BY lang
                                ORDER BY c DESC, tk) AS rank
      FROM c)
SELECT lang, tok, tf, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 3
"""
    sqls["token_diversity"] = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tk
             FROM documents),
c AS (SELECT source, tk, count(*) AS c FROM tok GROUP BY 1, 2)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(c * (c - 1)) AS BIGINT) AS simpson_num,
       CAST(sum(c) * (sum(c) - 1) AS BIGINT) AS simpson_den
FROM c GROUP BY source
"""
    sqls["gini_by_source"] = """
WITH h AS (SELECT source, n_chars AS v, count(*) AS c
           FROM documents GROUP BY 1, 2),
cum AS (SELECT source, v, c,
               coalesce(sum(c) OVER (PARTITION BY source ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS p,
               sum(c) OVER (PARTITION BY source) AS n
        FROM h)
SELECT source,
       CAST(min(n) AS BIGINT) AS n,
       CAST(sum(v * c * (2 * p + c - n)) AS BIGINT) AS gini_num,
       CAST(min(n) * sum(v * c) AS BIGINT) AS gini_den
FROM cum GROUP BY source
"""

    # 60-bit simhash: 15 hex chars of md5 = 60 bits (positive in BIGINT)
    _SIMHASH_CTE = """
tok AS (
  SELECT d.doc_id,
         ('0x' || substr(md5(t.tk), 1, 15))::BIGINT AS h
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tk)),
bitsum AS (
  SELECT doc_id, b.b AS bit,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok, (SELECT unnest(generate_series(0, 59)) AS b) b
  GROUP BY doc_id, b.b),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END)
              AS BIGINT) AS simhash
  FROM bitsum GROUP BY doc_id)
"""
    sqls["simhash_sigs"] = (f"WITH {_SIMHASH_CTE} "
                            "SELECT doc_id, simhash FROM sig")
    sqls["simhash_pairs"] = f"""
WITH {_SIMHASH_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""

    sqls["embedding_pairs"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {EMBED_COS_TAU!r}
"""

    # ---- ANN ----
    from freemap_tiler_ray.stages.ann import (N_CENTROIDS, N_PLANES,
                                              N_QUERIES, NPROBE, TOP_K)
    sqls["ann_topk"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
d AS (SELECT q.qid, e.vec_id, list_cosine_similarity(q.qv, e.v) AS cos
      FROM q CROSS JOIN e),
r AS (SELECT qid AS query_vec_id, vec_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id) AS rank
      FROM d)
SELECT query_vec_id, rank, vec_id FROM r WHERE rank <= {TOP_K}
"""
    sqls["ann_ivf"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
asg0 AS (SELECT e.vec_id, c.cid,
                row_number() OVER (PARTITION BY e.vec_id
                  ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid)
                  AS rn
         FROM e CROSS JOIN cent c),
asg AS (SELECT vec_id, cid AS cluster FROM asg0 WHERE rn = 1),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
pr0 AS (SELECT q.qid, c.cid,
               row_number() OVER (PARTITION BY q.qid
                 ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cid)
                 AS rn
        FROM q CROSS JOIN cent c),
probes AS (SELECT qid, cid FROM pr0 WHERE rn <= {NPROBE}),
cand AS (SELECT p.qid, a.vec_id
         FROM probes p JOIN asg a ON a.cluster = p.cid),
d AS (SELECT c.qid, c.vec_id,
             list_cosine_similarity(q.qv, e.v) AS cos
      FROM cand c JOIN q ON q.qid = c.qid JOIN e ON e.vec_id = c.vec_id),
r AS (SELECT qid AS query_vec_id, vec_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id) AS rank
      FROM d)
SELECT query_vec_id, rank, vec_id FROM r WHERE rank <= {TOP_K}
"""

    # LSH-bucketed ANN: sign-bit buckets over the first N_PLANES
    # embeddings as hyperplanes; candidates within hamming <= 1
    sqls["ann_lsh"] = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
pl AS (SELECT vec_id AS pid, v AS pv FROM e WHERE vec_id < {N_PLANES}),
bits AS (SELECT e.vec_id, p.pid,
                CASE WHEN list_inner_product(e.v, p.pv) >= 0
                     THEN 1 ELSE 0 END AS bit
         FROM e CROSS JOIN pl p),
bk AS (SELECT vec_id,
              CAST(sum(CASE WHEN bit = 1 THEN (1::BIGINT << pid)
                       ELSE 0 END) AS BIGINT) AS bucket
       FROM bits GROUP BY vec_id),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERIES}),
qb AS (SELECT q.qid, b.bucket FROM q JOIN bk b ON b.vec_id = q.qid),
cand AS (SELECT qb.qid, v.vec_id
         FROM qb JOIN bk v ON bit_count(xor(qb.bucket, v.bucket)) <= 1),
d AS (SELECT c.qid, c.vec_id, list_cosine_similarity(q.qv, e.v) AS cos
      FROM cand c JOIN q ON q.qid = c.qid JOIN e ON e.vec_id = c.vec_id),
r AS (SELECT qid AS query_vec_id, vec_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id) AS rank
      FROM d)
SELECT query_vec_id, rank, vec_id FROM r WHERE rank <= {TOP_K}
"""

    sqls["kmeans_clusters"] = _kmeans_sql()

    from freemap_tiler_ray.pipelines.queries import DIVERSE_Q
    # per-cluster quota over the kmeans assignments: same +777 mix32
    # hash chain as stratified_sample, over vec_id
    sqls["diverse_sample"] = _kmeans_sql(final_select=f"""
, b AS (SELECT vec_id, cluster,
               (vec_id % 4294967296 + 777) % 4294967296 AS v0 FROM af),
hs1 AS (SELECT vec_id, cluster,
              (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM b),
hs2 AS (SELECT vec_id, cluster,
              (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM hs1),
hh AS (SELECT vec_id, cluster, xor(v2 >> 16, v2) AS hv FROM hs2),
rr AS (SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY hv, vec_id) AS rn
      FROM hh)
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster
FROM rr WHERE rn <= {DIVERSE_Q}""")

    from freemap_tiler_ray.stages.ann import QUALITY_DIMS, quality_weights
    _qw = quality_weights()
    _score = " + ".join(
        f"CAST(embedding[{d + 1}] AS DOUBLE) * ({float(_qw[d])!r})"
        for d in range(QUALITY_DIMS))
    sqls["quality_scores"] = f"""
WITH s AS (SELECT vec_id,
                  CAST(floor(({_score}) * 1000000.0) AS BIGINT) AS score_e6
           FROM embeddings)
SELECT vec_id, score_e6, CAST(score_e6 >= 0 AS BIGINT) AS kept FROM s
"""

    sqls["tile_pyramid_status"] = (
        _tile_status_sql()
        + "SELECT CAST(zoom AS BIGINT) AS zoom, CAST(x AS BIGINT) AS x, "
          "CAST(y AS BIGINT) AS y, status FROM st")
    sqls["tile_limits"] = _tile_status_sql() + """
SELECT CAST(zoom AS BIGINT) AS zoom, min(x) AS min_x, max(x) AS max_x,
       min((1 << zoom) - 1 - y) AS min_y, max((1 << zoom) - 1 - y) AS max_y
FROM st WHERE status = 'data' GROUP BY zoom
"""
    sqls["q5_region_revenue"] = """
SELECT n_name,
       CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount))
                           * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_e4
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""
    sqls["pii_scan"] = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\b(?:key|hash)\\b'))
            AS BIGINT) AS n_key_hash,
       CAST(len(regexp_extract_all(text, 'join [a-z]+'))
            AS BIGINT) AS n_join_pair,
       CAST(len(regexp_extract_all(text, '[a-z0-9]+@[a-z0-9]+\\.[a-z]{2,}'))
            AS BIGINT) AS n_email
FROM documents
"""
    sqls["events_lag"] = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events)
SELECT user_id, count(gap) AS n_gaps,
       CAST(max(gap) AS BIGINT) AS max_gap_us,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us
FROM g WHERE gap IS NOT NULL
GROUP BY user_id
"""
    sqls["doc_chunks"] = """
WITH n AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
c AS (
  SELECT doc_id, n_tok,
         1 + (greatest(n_tok - 64, 0) + 47) // 48 AS n_ch FROM n),
u AS (
  SELECT doc_id, n_tok,
         unnest(generate_series(0, n_ch - 1)) AS chunk_id FROM c)
SELECT doc_id, chunk_id, chunk_id * 48 AS start_tok,
       least(64, n_tok - chunk_id * 48) AS n_tok
FROM u
"""
    sqls["pack_bins"] = """
WITH n AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
s AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS tok_before
  FROM n)
SELECT doc_id, n_tok, CAST(tok_before // 256 AS BIGINT) AS bin_id FROM s
"""
    sqls["tfidf_topk"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
df AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
nn AS (SELECT count(*) AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * ((nn.n * 1000) // df.df) AS BIGINT) AS score_milli
  FROM tf JOIN df ON tf.term = df.term CROSS JOIN nn),
r AS (
  SELECT doc_id, term, score_milli,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_milli DESC, term) AS rank
  FROM sc)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, score_milli
FROM r WHERE rank <= 3
"""
    sqls["user_sequences"] = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       md5(string_agg(event_type, ',' ORDER BY ts, event_id)) AS seq_fp
FROM events GROUP BY user_id
"""
    # KMV sketch: k-th minimum md5 of distinct token bigrams per lang.
    # (k-1)/U(k) with U(k) = top-32-bits(kth hex) / 2^32 — the same two
    # IEEE-754 double ops as stages/sketch.kmv_estimate, bit-identical.
    sqls["kmv_distinct"] = """
WITH t AS (SELECT lang, string_split(text, ' ') AS s FROM documents),
b AS (SELECT lang, s,
             unnest(generate_series(1, len(s) - 1)) AS i FROM t),
big AS (SELECT DISTINCT lang, s[i] || ' ' || s[i + 1] AS bg FROM b),
h AS (SELECT DISTINCT lang, md5(bg) AS hex FROM big),
r AS (SELECT lang, hex,
             row_number() OVER (PARTITION BY lang ORDER BY hex) AS rk,
             count(*) OVER (PARTITION BY lang) AS nd
      FROM h)
SELECT lang, CAST(LEAST(nd, 64) AS BIGINT) AS k_used,
       CASE WHEN nd < 64 THEN CAST(nd AS DOUBLE)
            ELSE CAST(63 AS DOUBLE) /
                 (CAST(CAST(concat('0x', substr(hex, 1, 8)) AS UBIGINT)
                       AS DOUBLE) / 4294967296.0)
       END AS est_distinct
FROM r WHERE rk = LEAST(nd, 64)
"""
    # PCA covariance partials (queries.embedding_pca): q = floor(e*1e6)
    # as BIGINT, XᵀX upper triangle via UNNEST + self-join on vec_id,
    # column sums as (i,-1), count as (-1,-1) — integer-exact mirror.
    sqls["embedding_pca"] = """
WITH e AS (
  SELECT vec_id, i - 1 AS dim,
         CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000.0)
              AS BIGINT) AS q
  FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
),
xtx AS (SELECT a.dim AS dim_i, b.dim AS dim_j,
               CAST(SUM(a.q * b.q) AS BIGINT) AS val
        FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        GROUP BY 1, 2),
sx AS (SELECT dim AS dim_i, CAST(-1 AS BIGINT) AS dim_j,
              CAST(SUM(q) AS BIGINT) AS val FROM e GROUP BY 1),
cnt AS (SELECT CAST(-1 AS BIGINT) AS dim_i, CAST(-1 AS BIGINT) AS dim_j,
               CAST(count(DISTINCT vec_id) AS BIGINT) AS val FROM e)
SELECT * FROM xtx UNION ALL SELECT * FROM sx UNION ALL SELECT * FROM cnt
"""
    sqls["passage_dedup"] = """
WITH t AS (SELECT lang, string_split(text, ' ') AS s FROM documents),
i AS (SELECT lang, s,
             unnest(generate_series(
                 1, CAST(ceil(len(s) / 8.0) AS BIGINT))) AS i FROM t),
c AS (SELECT lang, array_to_string(
          list_slice(s, (i - 1) * 8 + 1, LEAST(i * 8, len(s))),
          ' ') AS passage FROM i),
g AS (SELECT lang, passage, count(*) AS cnt FROM c GROUP BY 1, 2)
SELECT lang, CAST(sum(cnt) AS BIGINT) AS total_chunks,
       CAST(count(*) AS BIGINT) AS distinct_chunks,
       CAST(sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
           AS dup_chunks
FROM g GROUP BY lang
"""
    sqls["q4_order_priority"] = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
"""
    sqls["q12_priority_lines"] = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""
    sqls["rollup_revenue"] = """
WITH b AS (SELECT CAST(year(o_orderdate) AS VARCHAR) AS oyear,
                  o_orderpriority AS prio,
                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT COALESCE(oyear, 'ALL') AS oyear, COALESCE(prio, 'ALL') AS prio,
       CAST(SUM(cents) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM b GROUP BY ROLLUP (oyear, prio)
"""
    sqls["q18_top_customers"] = """
WITH t AS (SELECT o_custkey,
                  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS total_c,
                  CAST(count(*) AS BIGINT) AS n_orders
           FROM orders GROUP BY o_custkey
           HAVING SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
                  > 300000000)
SELECT c_name, o_custkey, total_c, n_orders
FROM t JOIN customer ON c_custkey = o_custkey
ORDER BY total_c DESC, o_custkey LIMIT 10
"""
    sqls["events_cumsum"] = """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 1000) AS BIGINT))
              OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS running_milli
FROM events
"""
    sqls["active_customer_union"] = """
SELECT o_custkey AS custkey FROM orders
UNION
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
"""
    sqls["q14_promo_share"] = """
WITH j AS (
  SELECT CAST(floor(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           AS rev_e4,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-02-01')
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END) AS BIGINT)
         AS promo_e4,
       CAST(SUM(rev_e4) AS BIGINT) AS total_e4,
       100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_e4 ELSE 0 END)
                    AS DOUBLE)
             / CAST(SUM(rev_e4) AS DOUBLE) AS promo_share
FROM j
"""
    sqls["max_acctbal_per_nation"] = """
SELECT c_nationkey, c_custkey, c_name, c_acctbal
FROM customer
WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
                   WHERE c2.c_nationkey = customer.c_nationkey)
"""
    sqls["ordered_balance_intersect"] = """
SELECT o_custkey AS custkey FROM orders
INTERSECT
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
"""
    sqls["events_rank"] = """
WITH r AS (
  SELECT user_id, event_id,
         CAST(floor(value * 1000) AS BIGINT) AS value_milli,
         rank() OVER (PARTITION BY user_id
                      ORDER BY CAST(floor(value * 1000) AS BIGINT) DESC)
           AS rnk
  FROM events)
SELECT user_id, event_id, value_milli, rnk FROM r WHERE rnk <= 3
"""
    sqls["events_ntile"] = """
WITH v AS (SELECT event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS value_milli
           FROM events)
SELECT event_id, value_milli,
       ntile(4) OVER (ORDER BY value_milli, event_id) AS bucket
FROM v
"""
    sqls["type_user_counts"] = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""
    sqls["nation_activity_full_join"] = """
WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                  count(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
                  count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       CAST(COALESCE(n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(n_supp, 0) AS BIGINT) AS n_supp
FROM c FULL JOIN s ON c.nationkey = s.nationkey
"""
    sqls["top_event_type"] = """
WITH c AS (SELECT user_id, event_type, count(*) AS n
           FROM events GROUP BY 1, 2),
     r AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type) AS rn
           FROM c)
SELECT user_id, event_type AS top_type, CAST(n AS BIGINT) AS n
FROM r WHERE rn = 1
"""
    sqls["value_moments"] = """
WITH v AS (SELECT event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(SUM(vm) AS BIGINT) AS s_milli,
       CAST(SUM(vm * vm) AS BIGINT) AS s2_milli,
       CAST(SUM(vm) AS DOUBLE) / count(*) AS mean_milli,
       (CAST(SUM(vm * vm) AS DOUBLE)
        - CAST(SUM(vm) AS DOUBLE) * CAST(SUM(vm) AS DOUBLE) / count(*))
       / (count(*) - 1) AS var_milli
FROM v GROUP BY event_type
"""
    sqls["embedding_quantize"] = """
WITH e AS (SELECT vec_id, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS i FROM embeddings),
m AS (SELECT vec_id, max(abs(CAST(x AS DOUBLE))) AS mx
      FROM e GROUP BY vec_id),
q AS (SELECT e.vec_id, m.mx,
             CAST(floor(CAST(e.x AS DOUBLE) * 127.0 / m.mx) AS BIGINT) AS q8,
             CAST(e.i AS BIGINT) AS i
      FROM e JOIN m ON e.vec_id = m.vec_id)
SELECT vec_id, max(mx) AS mx,
       CAST(SUM(q8) AS BIGINT) AS q_sum,
       CAST(min(q8) AS BIGINT) AS q_min,
       CAST(max(q8) AS BIGINT) AS q_max,
       CAST(SUM(q8 * i) AS BIGINT) AS q_fold
FROM q GROUP BY vec_id
"""
    sqls["cube_revenue"] = """
WITH b AS (SELECT CAST(year(o_orderdate) AS VARCHAR) AS oyear,
                  o_orderpriority AS prio,
                  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
SELECT COALESCE(oyear, 'ALL') AS oyear, COALESCE(prio, 'ALL') AS prio,
       CAST(SUM(cents) AS BIGINT) AS revenue_c,
       CAST(count(*) AS BIGINT) AS n_orders
FROM b GROUP BY CUBE (oyear, prio)
"""
    sqls["dormant_customer_except"] = """
SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
"""
    sqls["user_first_last"] = """
WITH o AS (SELECT user_id, event_type,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS n
           FROM events)
SELECT user_id,
       max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
       max(CASE WHEN rn = n THEN event_type END) AS last_type,
       CAST(max(n) AS BIGINT) AS n_events
FROM o GROUP BY user_id
"""
    sqls["events_pivot"] = """
SELECT user_id,
       CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT)
         AS n_purchase,
       CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""
    sqls["q7_nation_volume"] = """
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev_e4) AS BIGINT) AS revenue_e4
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
                  AS BIGINT) AS rev_e4
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
          OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01')
GROUP BY supp_nation, cust_nation, l_year
"""
    sqls["q9_profit"] = """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
                     AS BIGINT)) AS BIGINT) AS profit_e4
FROM lineitem, part, supplier, orders, nation
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
  AND p_name LIKE '%widget%'
GROUP BY n_name, o_year
"""
    sqls["q10_returned_items"] = """
WITH rev AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                             * 10000.0) AS BIGINT)) AS BIGINT) AS revenue_e4
  FROM orders, lineitem
  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY o_custkey)
SELECT r.c_custkey, c_name, n_name, revenue_e4
FROM rev r, customer, nation
WHERE r.c_custkey = customer.c_custkey AND c_nationkey = n_nationkey
ORDER BY revenue_e4 DESC, r.c_custkey LIMIT 20
"""
    sqls["q8_market_share"] = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CASE WHEN n1.n_name = 'NATION_8'
                     THEN CAST(floor(l_extendedprice * (1.0 - l_discount)
                                     * 10000.0) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS vol_nation_e4,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
                     AS BIGINT)) AS BIGINT) AS vol_total_e4
FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
     region
WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
  AND l_orderkey = o_orderkey AND o_custkey = c_custkey
  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
  AND n2.n_regionkey = r_regionkey AND r_name = 'ASIA'
  AND p_type = 'ECONOMY'
GROUP BY o_year
"""
    sqls["q11_important_suppliers"] = """
WITH v AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * l_quantity * 10000.0)
                       AS BIGINT)) AS BIGINT) AS value_e4
  FROM lineitem, supplier, nation
  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_3'
  GROUP BY l_suppkey)
SELECT s_suppkey, value_e4 FROM v
WHERE value_e4 > (SELECT sum(value_e4) FROM v) * 0.0001
"""
    sqls["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                             * 10000.0) AS BIGINT)) AS BIGINT)
           AS total_revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT rev.s_suppkey, s_name, total_revenue_e4
FROM rev, supplier
WHERE rev.s_suppkey = supplier.s_suppkey
  AND total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
"""
    sqls["q16_supplier_cnt"] = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM part, lineitem
WHERE p_partkey = l_partkey
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
GROUP BY p_brand, p_type, p_size
"""
    sqls["q17_small_qty"] = """
WITH li AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 10000.0) AS BIGINT) AS price_e4
  FROM lineitem, part
  WHERE p_partkey = l_partkey AND p_brand = 'Brand#5'),
st AS (
  SELECT l_partkey,
         CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty
  FROM li GROUP BY l_partkey)
SELECT CAST(sum(price_e4) AS BIGINT) AS small_rev_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM li, st
WHERE li.l_partkey = st.l_partkey
  AND CAST(qty AS DOUBLE) < 0.2 * avg_qty
"""
    sqls["q19_disjunctive"] = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0)
                     AS BIGINT)) AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem, part
WHERE p_partkey = l_partkey AND (
     (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 10
      AND l_quantity BETWEEN 1 AND 20)
  OR (p_brand = 'Brand#10' AND p_size BETWEEN 5 AND 20
      AND l_quantity BETWEEN 10 AND 30)
  OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 40
      AND l_quantity BETWEEN 20 AND 50))
"""
    sqls["pagerank"] = """
WITH eo AS (SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
            FROM orders, lineitem WHERE o_orderkey = l_orderkey),
edges AS (SELECT u AS src, v AS dst FROM eo
          UNION ALL SELECT v AS src, u AS dst FROM eo),
deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
        FROM edges GROUP BY src),
r0 AS (SELECT node, d, CAST(1000000000 AS BIGINT) AS r FROM deg),
s1 AS (SELECT e.dst AS node, sum(r0.r // r0.d) AS s
       FROM edges e JOIN r0 ON e.src = r0.node GROUP BY e.dst),
r1 AS (SELECT deg.node, deg.d,
              CAST(150000000 + (85 * s1.s) // 100 AS BIGINT) AS r
       FROM deg JOIN s1 ON deg.node = s1.node),
s2 AS (SELECT e.dst AS node, sum(r1.r // r1.d) AS s
       FROM edges e JOIN r1 ON e.src = r1.node GROUP BY e.dst),
r2 AS (SELECT deg.node,
              CAST(150000000 + (85 * s2.s) // 100 AS BIGINT) AS r
       FROM deg JOIN s2 ON deg.node = s2.node)
SELECT node, CASE WHEN node % 2 = 0 THEN 'cust' ELSE 'supp' END AS kind,
       r AS rank_e9
FROM r2
"""
    sqls["geo_pairs"] = f"""
WITH {_PTS_CTE}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (a.lon - b.lon) * (a.lon - b.lon)
         + (a.lat - b.lat) * (a.lat - b.lat) AS d2
FROM pts a, pts b
WHERE a.doc_id < b.doc_id
  AND (a.lon - b.lon) * (a.lon - b.lon)
        + (a.lat - b.lat) * (a.lat - b.lat) < 4.0
"""
    sqls["dup_spans"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
i AS (SELECT doc_id, s,
             unnest(generate_series(1, GREATEST(len(s) - 7, 0))) AS i
      FROM t),
g AS (SELECT doc_id, i,
             array_to_string(list_slice(s, i, i + 7), ' ') AS gram FROM i),
c AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
d AS (SELECT doc_id, i FROM g JOIN c USING (gram)),
r AS (SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
                       <= 7
                  THEN 0 ELSE 1 END AS is_start FROM d),
rr AS (SELECT doc_id, i,
              sum(is_start) OVER (PARTITION BY doc_id ORDER BY i) AS run
       FROM r),
agg AS (SELECT doc_id, run, count(*) AS starts, min(i) AS a, max(i) AS b
        FROM rr GROUP BY doc_id, run)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
       CAST(sum(starts) AS BIGINT) AS dup_grams,
       CAST(sum(b - a + 8) AS BIGINT) AS dup_tokens
FROM agg GROUP BY doc_id
"""
    sqls["events_hopping"] = """
SELECT event_type,
       (epoch_us(ts) // 3600000000 - k) * 3600000000 AS window_start_us,
       count(*) AS n_events, min(value) AS min_value,
       max(value) AS max_value
FROM events, (VALUES (0), (1)) AS hops(k)
GROUP BY event_type, window_start_us
"""
    sqls["funnel_conversion"] = """
WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND epoch_us(e.ts) > s.t1
      GROUP BY e.user_id),
p AS (SELECT DISTINCT e.user_id
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2)
SELECT CAST((SELECT count(*) FROM s) AS BIGINT) AS n_signup,
       CAST((SELECT count(*) FROM c) AS BIGINT) AS n_signup_click,
       CAST((SELECT count(*) FROM p) AS BIGINT) AS n_funnel
"""
    sqls["q13_order_counts"] = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
GROUP BY c_count
"""
    sqls["events_moving_avg"] = """
SELECT event_id, user_id,
       CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) OVER w AS DOUBLE)
         / (1000.0 * (COUNT(*) OVER w)) AS avg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""
    sqls["corr_qty_price"] = """
WITH b AS (
  SELECT l_returnflag,
         CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_extendedprice * 100) AS BIGINT) AS p
  FROM lineitem
), s AS (
  SELECT l_returnflag, COUNT(*) AS n,
         CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(p) AS BIGINT) AS sp,
         CAST(SUM(q * q) AS BIGINT) AS sqq,
         CAST(SUM((p * p) >> 32) AS BIGINT) AS spp_hi,
         CAST(SUM((p * p) & 4294967295) AS BIGINT) AS spp_lo,
         CAST(SUM(q * p) AS BIGINT) AS sqp
  FROM b GROUP BY l_returnflag)
SELECT l_returnflag, n, sq, sp, sqp,
  (CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)
     / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS cov_qp,
  (CAST(sqp AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)
     / CAST(n AS DOUBLE))
    / sqrt((CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)
              / CAST(n AS DOUBLE))
         * ((CAST(spp_hi AS DOUBLE) * 4294967296.0 + CAST(spp_lo AS DOUBLE))
              - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE)
              / CAST(n AS DOUBLE))) AS corr_qp
FROM s
"""
    sqls["value_histogram"] = """
SELECT event_type,
       CAST(least(floor(value / 40.0), 9) AS BIGINT) AS bucket,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""
    # Q21 shape: supplier who shipped LAST (ties to highest suppkey)
    # in multi-supplier 'F' orders — argmax as max of a packed
    # (days << 32 | suppkey) int64, mirroring queries.q21_last_shipper.
    sqls["q21_last_shipper"] = """
WITH l AS (
  SELECT l_orderkey,
         CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           * 4294967296 + l_suppkey AS pack,
         l_suppkey AS sk
  FROM lineitem),
w AS (SELECT l_orderkey, CAST(max(pack) AS BIGINT) AS wpack
      FROM l GROUP BY l_orderkey HAVING min(sk) <> max(sk)),
f AS (SELECT wpack % 4294967296 AS s
      FROM w JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F')
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM f JOIN supplier ON s = s_suppkey
GROUP BY s_name
"""
    # Q22 shape over c_nationkey % 10 country codes; threshold and
    # balance fold in integer cents with one double divide, mirroring
    # queries.q22_global_sales exactly.
    sqls["q22_global_sales"] = """
WITH c AS (
  SELECT c_custkey, c_nationkey % 10 AS code,
         CAST(floor(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7, 9)),
t AS (SELECT CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS thr
      FROM c WHERE cents > 0),
nob AS (SELECT code, cents FROM c
        WHERE CAST(cents AS DOUBLE) > (SELECT thr FROM t)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT'))
SELECT code AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(CAST(SUM(cents) AS BIGINT) AS DOUBLE) / 100.0 AS totacctbal
FROM nob GROUP BY code
"""
    sqls["edit_distance_pairs"] = """
WITH p AS (SELECT doc_id, lang, substr(text, 1, 40) AS pre
           FROM documents)
SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(a.pre, b.pre) AS BIGINT) AS dist
FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE levenshtein(a.pre, b.pre) <= 4
"""
    sqls["pareto_front"] = """
SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_brand = p.p_brand
    AND q.p_retailprice <= p.p_retailprice AND q.p_size <= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
"""
    sqls["retention_cohorts"] = """
WITH o AS (SELECT o_custkey,
                  CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                       - 23640 AS BIGINT) AS m
           FROM orders),
f AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY o_custkey),
j AS (SELECT o.o_custkey, f.cohort, o.m - f.cohort AS delta
      FROM o JOIN f USING (o_custkey))
SELECT cohort AS cohort_month, delta AS months_since,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM j GROUP BY 1, 2
"""
    sqls["q2_min_cost_supp"] = """
WITH ps AS (
  SELECT l_partkey AS p_partkey, l_suppkey,
         CAST(min(CAST(floor(l_extendedprice / l_quantity * 10000.0)
                       AS BIGINT)) AS BIGINT) AS cost_e4
  FROM lineitem, part, supplier, nation, region
  WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
    AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
    AND r_name = 'EUROPE' AND p_type = 'LARGE' AND p_size <= 25
  GROUP BY l_partkey, l_suppkey),
mn AS (SELECT p_partkey, min(cost_e4) AS min_cost
       FROM ps GROUP BY p_partkey)
SELECT CAST(floor(s_acctbal * 100.0) AS BIGINT) AS acctbal_e2,
       s_name, n_name, ps.p_partkey, cost_e4
FROM ps, mn, supplier, nation
WHERE ps.p_partkey = mn.p_partkey AND cost_e4 = min_cost
  AND ps.l_suppkey = s_suppkey AND s_nationkey = n_nationkey
"""
    sqls["q20_excess_stock"] = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_all,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate < TIMESTAMP '1997-01-01'
                       THEN CAST(l_quantity AS BIGINT) ELSE 0 END)
              AS BIGINT) AS qty_96
  FROM lineitem, part, supplier, nation
  WHERE l_partkey = p_partkey AND p_name LIKE 'large%'
    AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
    AND n_name = 'NATION_3'
  GROUP BY l_partkey, l_suppkey)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_excess_parts
FROM ps, supplier
WHERE qty_96 > 0 AND qty_all > 2 * qty_96 AND l_suppkey = s_suppkey
GROUP BY s_suppkey, s_name
"""
    sqls["triangle_count"] = """
WITH lp AS (
  SELECT DISTINCT l_orderkey, l_partkey
  FROM lineitem, part
  WHERE l_partkey = p_partkey AND p_size <= 15),
e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM lp a, lp b
      WHERE a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS node FROM e
              UNION ALL SELECT v AS node FROM e)
        GROUP BY node),
ed AS (SELECT CASE WHEN du.d * 4294967296 + u < dv.d * 4294967296 + v
                   THEN u ELSE v END AS s,
              CASE WHEN du.d * 4294967296 + u < dv.d * 4294967296 + v
                   THEN v ELSE u END AS dst,
              greatest(du.d * 4294967296 + u,
                       dv.d * 4294967296 + v) AS kd
       FROM e JOIN deg du ON e.u = du.node
              JOIN deg dv ON e.v = dv.node),
w AS (SELECT e1.dst AS b, e2.dst AS c
      FROM ed e1 JOIN ed e2 ON e1.s = e2.s AND e1.kd < e2.kd)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT count(*) FROM w) AS BIGINT) AS n_wedges,
       CAST((SELECT count(*) FROM w
             JOIN ed ON w.b = ed.s AND w.c = ed.dst)
            AS BIGINT) AS n_triangles
"""
    sqls["lineitem_melt"] = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'quantity' AS measure,
       CAST(floor(l_quantity * 10000.0) AS BIGINT) AS value_e4
FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'extendedprice',
       CAST(floor(l_extendedprice * 10000.0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'discount',
       CAST(floor(l_discount * 10000.0) AS BIGINT)
FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'tax',
       CAST(floor(l_tax * 10000.0) AS BIGINT)
FROM lineitem
"""
    sqls["order_lines_concat"] = """
SELECT l_orderkey AS o_orderkey,
       string_agg(CAST(l_partkey AS VARCHAR), ','
                  ORDER BY l_linenumber, l_partkey) AS part_list,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY l_orderkey
"""
    sqls["embedding_unnest"] = """
SELECT vec_id, CAST(i - 1 AS BIGINT) AS dim,
       CAST(floor(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                  * 1000000.0) AS BIGINT) AS value_e6
FROM embeddings, UNNEST(generate_series(1, 64)) AS t(i)
"""

    # ---- round-4 continuation: filtered ANN / OOV rate / RANGE frame /
    # bounded BFS ----
    from freemap_tiler_ray.pipelines.queries import (BFS_MAX_HOPS,
                                                     BFS_SEED_MAX,
                                                     OOV_VOCAB_V,
                                                     RANGE_FRAME_US)
    sqls["bfs_hops"] = f"""
WITH RECURSIVE eo AS (
  SELECT DISTINCT o.o_custkey * 2 AS u, l.l_suppkey * 2 + 1 AS v
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
e AS (SELECT u AS src, v AS dst FROM eo
      UNION ALL SELECT v, u FROM eo),
walk(node, hops) AS (
  SELECT DISTINCT src, 0 FROM e WHERE src < {BFS_SEED_MAX}
  UNION
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {BFS_MAX_HOPS})
SELECT node, CAST(min(hops) AS BIGINT) AS hops FROM walk GROUP BY node
"""
    sqls["ann_filtered"] = f"""
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS qid, label AS qlab, v AS qv
      FROM e WHERE vec_id < {N_QUERIES}),
d AS (SELECT q.qid, e.vec_id, list_cosine_similarity(q.qv, e.v) AS cos
      FROM q JOIN e ON e.label <> q.qlab),
r AS (SELECT qid AS query_vec_id, vec_id,
             row_number() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id) AS rank
      FROM d)
SELECT query_vec_id, CAST(rank AS BIGINT) AS rank, vec_id
FROM r WHERE rank <= {TOP_K}
"""
    sqls["oov_rate"] = f"""
WITH tok AS (
  SELECT d.doc_id, t.tk
  FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(tk)),
cnt AS (SELECT tk, count(*) AS tf FROM tok GROUP BY tk),
voc AS (SELECT tk FROM cnt ORDER BY tf DESC, tk LIMIT {OOV_VOCAB_V})
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tk IN (SELECT tk FROM voc)
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
FROM tok GROUP BY doc_id
"""
    sqls["events_range_frame"] = f"""
WITH v AS (SELECT event_id, user_id, ts,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events)
SELECT event_id, user_id,
       CAST(sum(vm) OVER w AS BIGINT) AS range_sum_milli,
       CAST(count(*) OVER w AS BIGINT) AS range_cnt
FROM v
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL {RANGE_FRAME_US // 1_000_000} SECONDS
                   PRECEDING AND CURRENT ROW)
"""
    # per-user hourly LOCF gap-fill: densify each user's hour span,
    # carry the latest (ts, event_id) observation forward
    sqls["gap_fill_locf"] = """
WITH e AS (SELECT user_id, ts, event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm,
                  CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h
           FROM events),
b AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM e
      GROUP BY user_id),
grid AS (SELECT user_id, unnest(generate_series(h0, h1)) AS h FROM b),
lph AS (SELECT user_id, h, vm,
               row_number() OVER (PARTITION BY user_id, h
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM e),
lh AS (SELECT user_id, h, vm FROM lph WHERE rn = 1)
SELECT g.user_id, CAST(g.h AS BIGINT) AS hour, lh.vm AS vm
FROM grid g ASOF JOIN lh ON g.user_id = lh.user_id AND g.h >= lh.h
"""
    # PERCENT_RANK quantile normalization per event_type, integer-exact
    # via (rank-1)*1000 // (n-1)
    sqls["quantile_normalize"] = """
WITH v AS (SELECT event_id, event_type,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
r AS (SELECT event_id, event_type, vm,
             rank() OVER (PARTITION BY event_type ORDER BY vm) AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v)
SELECT event_id, event_type, vm AS value_milli,
       CAST(CASE WHEN n <= 1 THEN 0
                 ELSE (rk - 1) * 1000 // (n - 1) END AS BIGINT) AS pr_milli
FROM r
"""
    # alpha=0.5 temperature-smoothed language-mixture sample: quota
    # n_l = min(c_l, (total // FRAC) * isqrt(c_l) // sum isqrt), keep
    # the n_l smallest (mix32 hash, doc_id) per lang
    from freemap_tiler_ray.pipelines.queries import MIXTURE_FRAC
    sqls["mixture_sample"] = f"""
WITH h0 AS (SELECT doc_id, lang,
                   (doc_id % 4294967296 + 777) % 4294967296 AS v0
            FROM documents),
h1 AS (SELECT doc_id, lang,
              (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM h0),
h2 AS (SELECT doc_id, lang,
              (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM h1),
hh AS (SELECT doc_id, lang, xor(v2 >> 16, v2) AS hv FROM h2),
c AS (SELECT lang, count(*) AS cl FROM documents GROUP BY lang),
s AS (SELECT lang, cl,
             CAST(floor(sqrt(CAST(cl AS DOUBLE))) AS BIGINT) AS sl FROM c),
t AS (SELECT sum(cl) AS total, sum(sl) AS ssum FROM s),
q AS (SELECT lang, LEAST(cl, (total // {MIXTURE_FRAC}) * sl // ssum)
        AS nl FROM s, t),
r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY hv, doc_id) AS rn FROM hh)
SELECT r.doc_id, r.lang FROM r JOIN q USING (lang) WHERE rn <= nl
"""
    from freemap_tiler_ray.pipelines.queries import BLOOM_JOIN_THRESH
    sqls["bloom_semi_join"] = f"""
SELECT l_returnflag,
       count(*) AS n_lines,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_totalprice > {BLOOM_JOIN_THRESH})
GROUP BY l_returnflag
"""
    from freemap_tiler_ray.pipelines.queries import (SPLIT_SALT,
                                                     SPLIT_TRAIN_PCT,
                                                     SPLIT_VAL_PCT)
    sqls["dataset_split"] = f"""
WITH h0 AS (SELECT doc_id, lang,
                   (doc_id % 4294967296 + {SPLIT_SALT}) % 4294967296 AS v0
            FROM documents),
h1 AS (SELECT doc_id, lang,
              (xor(v0 >> 16, v0) * 73244475) % 4294967296 AS v1 FROM h0),
h2 AS (SELECT doc_id, lang,
              (xor(v1 >> 16, v1) * 73244475) % 4294967296 AS v2 FROM h1),
hh AS (SELECT doc_id, lang, xor(v2 >> 16, v2) % 100 AS b FROM h2)
SELECT doc_id, lang,
       CASE WHEN b < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN b < {SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM hh
"""
    sqls["cell_pyramid"] = f"""
WITH {_PTS_CTE}, {cell_expr},
cc AS (SELECT cell_x, cell_y, count(*) AS n FROM cells GROUP BY 1, 2)
SELECT r.res,
       cc.cell_x >> (6 - r.res) AS cell_x,
       cc.cell_y >> (6 - r.res) AS cell_y,
       CAST(sum(n) AS BIGINT) AS n_docs
FROM cc, generate_series(0, 6) r(res)
GROUP BY 1, 2, 3
"""
    sqls["weighted_median"] = """
WITH h AS (SELECT l_returnflag,
                  CAST(round(l_extendedprice * 1000) AS BIGINT) AS vm,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
           FROM lineitem GROUP BY 1, 2),
c AS (SELECT l_returnflag, vm, w,
             sum(w) OVER (PARTITION BY l_returnflag ORDER BY vm) AS cum,
             sum(w) OVER (PARTITION BY l_returnflag) AS total FROM h)
SELECT l_returnflag,
       CAST(max(total) AS BIGINT) AS total_qty,
       CAST(min(vm) AS BIGINT) AS median_price_milli
FROM c WHERE 2 * cum >= total
GROUP BY l_returnflag
"""
    sqls["running_distinct"] = """
WITH f AS (SELECT event_id, user_id, ts,
                  CASE WHEN row_number() OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) = 1
                       THEN 1 ELSE 0 END AS first
           FROM events)
SELECT event_id, user_id,
       CAST(sum(first) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS BIGINT)
         AS n_distinct
FROM f
"""
    sqls["normalize_text"] = """
WITH n AS (SELECT doc_id,
                  trim(regexp_replace(regexp_replace(lower(text),
                       '[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'),
                       ' ') AS norm_text
           FROM documents)
SELECT doc_id, norm_text,
       CAST(length(norm_text) AS BIGINT) AS n_norm_chars
FROM n
"""
    from freemap_tiler_ray.pipelines.queries import PII_REDACT_STEPS
    (p1, r1), (p2, r2) = PII_REDACT_STEPS
    sqls["pii_redact"] = f"""
WITH s1 AS (SELECT doc_id,
                   len(regexp_extract_all(text, '{p1}')) AS c1,
                   regexp_replace(text, '{p1}', '{r1}', 'g') AS t
            FROM documents),
s2 AS (SELECT doc_id, c1,
              len(regexp_extract_all(t, '{p2}')) AS c2,
              regexp_replace(t, '{p2}', '{r2}', 'g') AS t
       FROM s1)
SELECT doc_id, t AS redacted, CAST(c1 + c2 AS BIGINT) AS n_redactions
FROM s2
"""
    from freemap_tiler_ray.pipelines.queries import KCORE_K
    sqls["kcore_nodes"] = f"""
WITH j AS (SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
e AS (SELECT u, v FROM j UNION ALL SELECT v AS u, u AS v FROM j),
a1 AS (SELECT u AS node FROM e GROUP BY u HAVING count(*) >= {KCORE_K}),
e1 AS (SELECT e.u, e.v FROM e
       JOIN a1 x ON e.u = x.node JOIN a1 y ON e.v = y.node),
a2 AS (SELECT u AS node FROM e1 GROUP BY u HAVING count(*) >= {KCORE_K}),
e2 AS (SELECT e1.u, e1.v FROM e1
       JOIN a2 x ON e1.u = x.node JOIN a2 y ON e1.v = y.node),
a3 AS (SELECT u AS node FROM e2 GROUP BY u HAVING count(*) >= {KCORE_K}),
e3 AS (SELECT e2.u, e2.v FROM e2
       JOIN a3 x ON e2.u = x.node JOIN a3 y ON e2.v = y.node),
a4 AS (SELECT u AS node FROM e3 GROUP BY u HAVING count(*) >= {KCORE_K}),
e4 AS (SELECT e3.u, e3.v FROM e3
       JOIN a4 x ON e3.u = x.node JOIN a4 y ON e3.v = y.node)
SELECT u AS node, CAST(count(*) AS BIGINT) AS deg FROM e4 GROUP BY u
"""
    sqls["time_rollup"] = """
WITH b AS (SELECT
    CAST(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS BIGINT)
      AS day_s,
    CAST(epoch(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS BIGINT)
      AS week_s,
    CAST(epoch(CAST(date_trunc('month', ts) AS TIMESTAMP)) AS BIGINT)
      AS month_s,
    CAST(floor(value * 1000) AS BIGINT) AS vm
  FROM events)
SELECT 'day' AS level, day_s AS bucket_s, count(*) AS n_events,
       CAST(sum(vm) AS BIGINT) AS sum_milli FROM b GROUP BY day_s
UNION ALL
SELECT 'week', week_s, count(*), CAST(sum(vm) AS BIGINT)
FROM b GROUP BY week_s
UNION ALL
SELECT 'month', month_s, count(*), CAST(sum(vm) AS BIGINT)
FROM b GROUP BY month_s
"""
    from freemap_tiler_ray.pipelines.queries import VOCAB_COVERAGE_KS
    ks_values = ", ".join(f"({k})" for k in VOCAB_COVERAGE_KS)
    sqls["vocab_coverage"] = f"""
WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
             FROM documents),
tf AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
r AS (SELECT tf, row_number() OVER (ORDER BY tf DESC, tok) AS rn
      FROM tf),
t AS (SELECT CAST(sum(tf) AS BIGINT) AS total FROM tf)
SELECT k.k, CAST(sum(r.tf) AS BIGINT) AS top_tf,
       t.total AS total_tf,
       CAST(sum(r.tf) * 1000000 // t.total AS BIGINT) AS cov_ppm
FROM r, t, (VALUES {ks_values}) k(k)
WHERE r.rn <= k.k
GROUP BY k.k, t.total
"""
    sqls["bigram_novelty"] = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts
             FROM documents),
bg0 AS (SELECT doc_id,
               unnest([ts[i] || ' ' || ts[i + 1]
                       FOR i IN generate_series(1, len(ts) - 1)]) AS bg
        FROM tok),
bg AS (SELECT DISTINCT doc_id, bg FROM bg0),
mn AS (SELECT bg, min(doc_id) AS mdoc FROM bg GROUP BY bg),
nb AS (SELECT doc_id, count(*) AS n_bigrams FROM bg GROUP BY doc_id),
nv AS (SELECT mdoc AS doc_id, count(*) AS n_novel FROM mn GROUP BY mdoc)
SELECT nb.doc_id, nb.n_bigrams,
       CAST(COALESCE(nv.n_novel, 0) AS BIGINT) AS n_novel
FROM nb LEFT JOIN nv USING (doc_id)
"""
    sqls["quality_audit"] = """
SELECT 'orphan_lineitem' AS rule, CAST(count(*) AS BIGINT) AS n_violations
FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IS NULL
UNION ALL
SELECT 'ship_before_order', CAST(count(*) AS BIGINT)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate < o.o_orderdate
UNION ALL
SELECT 'orphan_order', CAST(count(*) AS BIGINT)
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_custkey IS NULL
UNION ALL
SELECT 'neg_acctbal', CAST(count(*) AS BIGINT)
FROM customer WHERE c_acctbal < 0
UNION ALL
SELECT 'zero_qty', CAST(count(*) AS BIGINT)
FROM lineitem WHERE l_quantity <= 0
"""
    sqls["max_drawdown"] = """
WITH v AS (SELECT user_id, ts, event_id,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
c AS (SELECT user_id, ts, event_id,
             SUM(vm) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS cs FROM v),
d AS (SELECT user_id,
             MAX(cs) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) - cs AS dd FROM c)
SELECT user_id, CAST(MAX(dd) AS BIGINT) AS max_drawdown_milli,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM d GROUP BY user_id
"""
    sqls["ks_distance"] = """
WITH v AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS vm
           FROM events),
h AS (SELECT event_type, vm, CAST(count(*) AS BIGINT) AS c
      FROM v GROUP BY 1, 2),
tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n FROM h GROUP BY 1),
na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
grid AS (SELECT DISTINCT vm FROM h),
fh AS (SELECT t.event_type, g.vm, COALESCE(h.c, 0) AS c
       FROM grid g CROSS JOIN tot t
       LEFT JOIN h ON h.event_type = t.event_type AND h.vm = g.vm),
cum AS (SELECT event_type, vm,
               SUM(c) OVER (PARTITION BY event_type ORDER BY vm) AS ct
        FROM fh),
av AS (SELECT vm, CAST(sum(c) AS BIGINT) AS c FROM h GROUP BY vm),
ca AS (SELECT vm, SUM(c) OVER (ORDER BY vm) AS call FROM av),
d AS (SELECT c.event_type, t.n AS n_type, na.n - t.n AS n_rest,
             ABS(c.ct * (na.n - t.n) - (ca.call - c.ct) * t.n) AS dn
      FROM cum c JOIN ca ON ca.vm = c.vm
      JOIN tot t ON t.event_type = c.event_type CROSS JOIN na)
SELECT event_type, CAST(n_type AS BIGINT) AS n_type,
       CAST(n_rest AS BIGINT) AS n_rest,
       CAST(MAX(dn) AS BIGINT) AS d_num,
       CAST(MAX(dn) * 1000000 // (n_type * n_rest) AS BIGINT) AS ks_ppm
FROM d GROUP BY event_type, n_type, n_rest
"""
    from freemap_tiler_ray.pipelines.queries import (LINK_MIN_CN,
                                                     LINK_POP_CAP,
                                                     PMI_MIN_COUNT,
                                                     PMI_SCALE)
    sqls["term_pmi"] = f"""
WITH tok AS (SELECT string_split(text, ' ') AS ts FROM documents),
uni AS (SELECT unnest(ts) AS tok FROM tok),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY tok),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM uni),
bg0 AS (SELECT unnest([ts[i] || ' ' || ts[i + 1]
                       FOR i IN generate_series(1, len(ts) - 1)]) AS bg
        FROM tok),
bg AS (SELECT string_split(bg, ' ')[1] AS tok1,
              string_split(bg, ' ')[2] AS tok2,
              CAST(count(*) AS BIGINT) AS c_xy
       FROM bg0 GROUP BY 1, 2),
bt AS (SELECT CAST(sum(c_xy) AS BIGINT) AS b FROM bg)
SELECT bg.tok1, bg.tok2, bg.c_xy, u1.c AS c1, u2.c AS c2,
       CAST(({PMI_SCALE}::HUGEINT * bg.c_xy * nt.n * nt.n)
            // (u1.c::HUGEINT * u2.c * bt.b) AS BIGINT) AS pmi_milli
FROM bg JOIN uc u1 ON u1.tok = bg.tok1
        JOIN uc u2 ON u2.tok = bg.tok2, nt, bt
WHERE bg.c_xy >= {PMI_MIN_COUNT}
"""
    sqls["link_predict"] = f"""
WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
pd AS (SELECT p FROM cp GROUP BY p
       HAVING count(*) <= {LINK_POP_CAP} AND count(*) >= 2)
SELECT a.c AS cust1, b.c AS cust2, CAST(count(*) AS BIGINT) AS cn
FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c JOIN pd ON pd.p = a.p
GROUP BY 1, 2 HAVING count(*) >= {LINK_MIN_CN}
"""
    from freemap_tiler_ray.stages.dedup import CONT_TAU_PPM
    sqls["containment_pairs"] = f"""
WITH {_SH_CTE},
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT c.doc_a, c.doc_b, count(*) AS i
          FROM cand c
          JOIN sh x ON x.doc_id = c.doc_a
          JOIN sh y ON y.doc_id = c.doc_b AND y.h = x.h
          GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b, CAST(i.i AS BIGINT) AS n_common,
       CAST(ca.n AS BIGINT) AS sz_a, CAST(cb.n AS BIGINT) AS sz_b,
       CAST(i.i * 1000000 // LEAST(ca.n, cb.n) AS BIGINT) AS cont_ppm
FROM inter i JOIN cnt ca ON ca.doc_id = i.doc_a
             JOIN cnt cb ON cb.doc_id = i.doc_b
WHERE i.i * 1000000 >= {CONT_TAU_PPM} * LEAST(ca.n, cb.n)
"""
    sqls["chi2_drift"] = """
WITH e AS (SELECT event_type,
                  (epoch_us(ts) // 86400000000 + 3) % 7 AS dow
           FROM events),
h AS (SELECT event_type, dow, CAST(count(*) AS BIGINT) AS o
      FROM e GROUP BY 1, 2),
r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rn FROM h GROUP BY 1),
c AS (SELECT dow, CAST(sum(o) AS BIGINT) AS cn FROM h GROUP BY 1),
n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM e),
cells AS (SELECT r.event_type, c.dow, COALESCE(h.o, 0) AS o, r.rn, c.cn
          FROM r CROSS JOIN c
          LEFT JOIN h ON h.event_type = r.event_type AND h.dow = c.dow)
SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_events,
       CAST(SUM((1000000::HUGEINT * (nn * o - rn * cn) * (nn * o - rn * cn))
                // (nn::HUGEINT * nn * rn * cn)) AS BIGINT) AS chi2_ppm
FROM cells, n GROUP BY event_type
"""
    sqls["digit_profile"] = """
WITH v AS (SELECT event_type,
                  GREATEST(CAST(floor(value * 1000) AS BIGINT), 1) AS vm
           FROM events),
d AS (SELECT event_type,
             CAST(substr(CAST(vm AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM v),
h AS (SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2),
t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot FROM h GROUP BY 1)
SELECT h.event_type, h.digit, h.n,
       CAST(h.n * 1000000 // t.tot AS BIGINT) AS share_ppm
FROM h JOIN t ON t.event_type = h.event_type
"""
    sqls["event_markov"] = """
WITH s AS (SELECT user_id, event_type,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS nxt
           FROM events),
h AS (SELECT event_type AS from_type, nxt AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot FROM h GROUP BY 1)
SELECT h.from_type, h.to_type, h.n,
       CAST(h.n * 1000000 // t.tot AS BIGINT) AS row_ppm
FROM h JOIN t USING (from_type)
"""
    sqls["centroid_sims"] = """
WITH q0 AS (SELECT vec_id, label, unnest(embedding) AS x,
              generate_subscripts(embedding, 1) AS i FROM embeddings),
vmx AS (SELECT vec_id, max(abs(CAST(x AS DOUBLE))) AS mx
        FROM q0 GROUP BY vec_id),
q AS (SELECT q0.label, CAST(q0.i AS BIGINT) AS i,
             CAST(floor(CAST(q0.x AS DOUBLE) * 127.0 / vmx.mx)
                  AS BIGINT) AS q8
      FROM q0 JOIN vmx ON q0.vec_id = vmx.vec_id),
s AS (SELECT CAST(label AS BIGINT) AS label, i,
             CAST(sum(q8) AS BIGINT) AS v
      FROM q GROUP BY label, i)
SELECT a.label AS label_a, b.label AS label_b,
       CAST(sum(a.v * b.v) AS BIGINT) AS dot
FROM s a JOIN s b ON a.i = b.i AND a.label <= b.label
GROUP BY 1, 2
"""
    from freemap_tiler_ray.pipelines.queries import PB_PARTS
    sqls["partition_balance"] = f"""
WITH k AS (
  SELECT 'user_id_mod' AS key_name, user_id % {PB_PARTS} AS part
  FROM events
  UNION ALL
  SELECT 'event_id_mod', event_id % {PB_PARTS} FROM events
  UNION ALL
  SELECT 'event_type_md5',
         ('0x' || substr(md5(event_type), 1, 15))::BIGINT % {PB_PARTS}
  FROM events),
h AS (SELECT key_name, part, CAST(count(*) AS BIGINT) AS n
      FROM k GROUP BY 1, 2),
t AS (SELECT key_name, CAST(count(*) AS BIGINT) AS parts_hit,
             CAST(max(n) AS BIGINT) AS max_n,
             CAST(min(n) AS BIGINT) AS min_n,
             CAST(sum(n) AS BIGINT) AS tot
      FROM h GROUP BY 1)
SELECT key_name, parts_hit, max_n, min_n,
       CAST(max_n * {PB_PARTS} * 1000000 // tot AS BIGINT)
         AS imbalance_ppm
FROM t
"""
    sqls["dedup_survivorship"] = """
WITH fp AS (SELECT doc_id, md5(lower(trim(text))) AS fingerprint,
                   lang, source, n_chars
            FROM documents),
base AS (SELECT fingerprint,
                CAST(min(doc_id) AS BIGINT) AS survivor_doc,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM fp GROUP BY fingerprint),
nl AS (SELECT fingerprint,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       FROM fp GROUP BY fingerprint),
ns AS (SELECT fingerprint,
              CAST(count(DISTINCT source) AS BIGINT) AS n_sources
       FROM fp GROUP BY fingerprint)
SELECT b.survivor_doc, b.n_docs, nl.n_langs, ns.n_sources, b.total_chars
FROM base b JOIN nl USING (fingerprint) JOIN ns USING (fingerprint)
"""
    sqls["langid_confusion"] = f"""
WITH s AS (
  SELECT d.doc_id, d.lang AS lang_true,
    length(list_filter({_TOKS}, t -> t IN {_MK['en']})) AS en_score,
    length(list_filter({_TOKS}, t -> t IN {_MK['de']})) AS de_score,
    length(list_filter({_TOKS}, t -> t IN {_MK['fr']})) AS fr_score
  FROM documents d),
p AS (SELECT lang_true,
  CASE WHEN en_score >= de_score AND en_score >= fr_score AND en_score > 0
       THEN 'en'
       WHEN de_score >= fr_score AND de_score > 0 THEN 'de'
       WHEN fr_score > 0 THEN 'fr' ELSE 'und' END AS lang_pred
  FROM s),
h AS (SELECT lang_true, lang_pred, CAST(count(*) AS BIGINT) AS n
      FROM p GROUP BY 1, 2),
t AS (SELECT lang_true, CAST(sum(n) AS BIGINT) AS tot FROM h GROUP BY 1)
SELECT h.lang_true, h.lang_pred, h.n,
       CAST(h.n * 1000000 // t.tot AS BIGINT) AS share_ppm
FROM h JOIN t USING (lang_true)
"""
    sqls["degree_hist"] = """
WITH cp AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
deg AS (SELECT c, CAST(count(*) AS BIGINT) AS degree FROM cp GROUP BY c)
SELECT degree, CAST(count(*) AS BIGINT) AS n_customers
FROM deg GROUP BY degree
"""
    sqls["doc_commonness"] = """
WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             FROM documents),
uc AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY tok),
d AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2)
SELECT d.doc_id, CAST(sum(d.c) AS BIGINT) AS n_tokens,
       CAST(sum(d.c * uc.tf) AS BIGINT) AS sum_tf,
       CAST(sum(d.c * uc.tf) * 1000 // sum(d.c) AS BIGINT)
         AS mean_tf_milli
FROM d JOIN uc USING (tok) GROUP BY d.doc_id
"""
    sqls["dedup_eval"] = f"""
WITH {_SIMHASH_CTE},
{_SH_CTE},
pred AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash))
               <= {SIMHASH_MAX_HAMMING}),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM sh x JOIN sh y ON x.h = y.h AND x.doc_id < y.doc_id),
{_JACCARD_TAIL},
truth AS (SELECT doc_a, doc_b FROM jac
          WHERE jaccard >= {NGRAM_JACCARD_TAU!r}),
m AS (SELECT p.doc_a IS NOT NULL AS in_p, t.doc_a IS NOT NULL AS in_t
      FROM pred p FULL OUTER JOIN truth t
      ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b),
c AS (SELECT CAST(sum(CASE WHEN in_p AND in_t THEN 1 ELSE 0 END)
                  AS BIGINT) AS tp,
             CAST(sum(CASE WHEN in_p AND NOT in_t THEN 1 ELSE 0 END)
                  AS BIGINT) AS fp,
             CAST(sum(CASE WHEN NOT in_p AND in_t THEN 1 ELSE 0 END)
                  AS BIGINT) AS fn
      FROM m)
SELECT tp, fp, fn,
       CASE WHEN tp + fp > 0
            THEN CAST(tp * 1000000 // (tp + fp) AS BIGINT)
            ELSE 0 END AS precision_ppm,
       CASE WHEN tp + fn > 0
            THEN CAST(tp * 1000000 // (tp + fn) AS BIGINT)
            ELSE 0 END AS recall_ppm
FROM c
"""
    sqls["span_lang_stats"] = f"""
WITH {_SPANS_CTE}
SELECT d.lang, s.kind, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(length(s.text)) AS BIGINT) AS total_text_chars
FROM spans s JOIN documents d USING (doc_id)
GROUP BY 1, 2
"""
    sqls["assoc_rules"] = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu FROM ut),
ta AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
       FROM ut GROUP BY 1),
pb AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              CAST(count(*) AS BIGINT) AS n_both
       FROM ut a JOIN ut b
         ON a.user_id = b.user_id AND a.event_type < b.event_type
       GROUP BY 1, 2)
SELECT pb.type_a, pb.type_b, pb.n_both, x.n AS n_a, y.n AS n_b,
       CAST(pb.n_both * 1000000 // n.nu AS BIGINT) AS support_ppm,
       CAST(pb.n_both * 1000000 // x.n AS BIGINT) AS conf_ppm,
       CAST((1000::HUGEINT * pb.n_both * n.nu)
            // (x.n::HUGEINT * y.n) AS BIGINT) AS lift_milli
FROM pb JOIN ta x ON x.event_type = pb.type_a
        JOIN ta y ON y.event_type = pb.type_b, n
"""
    sqls["hapax_share"] = """
WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
             FROM documents),
vt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2),
a AS (SELECT source, CAST(count(*) AS BIGINT) AS vocab,
             CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax
      FROM vt GROUP BY 1)
SELECT source, vocab, hapax,
       CAST(hapax * 1000000 // vocab AS BIGINT) AS hapax_ppm
FROM a
"""
    from freemap_tiler_ray.pipelines.queries import FULFILL_PCTS
    _pcts = ", ".join(f"({p})" for p in FULFILL_PCTS)
    sqls["fulfillment_days"] = f"""
WITH last AS (SELECT l_orderkey,
                     max(epoch_us(l_shipdate) // 86400000000) AS sd
              FROM lineitem GROUP BY l_orderkey),
d AS (SELECT o.o_orderpriority AS prio,
             last.sd - (epoch_us(o.o_orderdate) // 86400000000) AS days
      FROM last JOIN orders o ON o.o_orderkey = last.l_orderkey),
h AS (SELECT prio, days, CAST(count(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2),
cum AS (SELECT prio, days,
               SUM(c) OVER (PARTITION BY prio ORDER BY days) AS cum,
               SUM(c) OVER (PARTITION BY prio) AS n
        FROM h)
SELECT prio, CAST(pct AS BIGINT) AS pct, CAST(min(days) AS BIGINT) AS days
FROM cum CROSS JOIN (VALUES {_pcts}) v(pct)
WHERE cum * 100 >= pct * n
GROUP BY prio, pct
"""
    from freemap_tiler_ray.pipelines.queries import BURST_WINDOW_S
    sqls["burst_detect"] = f"""
WITH b AS (SELECT user_id,
                  epoch_us(ts) // 1000000 // {BURST_WINDOW_S} AS bucket
           FROM events),
ub AS (SELECT user_id, bucket, CAST(count(*) AS BIGINT) AS c
       FROM b GROUP BY 1, 2)
SELECT user_id, CAST(max(c) AS BIGINT) AS max_per_window,
       CAST(count(*) AS BIGINT) AS n_windows
FROM ub GROUP BY user_id
"""
    from freemap_tiler_ray.stages.ann import TOP_K as _ANN_K
    sqls["ann_recall_eval"] = f"""
WITH ivf AS ({sqls["ann_ivf"]}),
brute AS ({sqls["ann_topk"]}),
m AS (SELECT b.query_vec_id,
             CAST(count(ivf.vec_id) AS BIGINT) AS n_overlap
      FROM brute b LEFT JOIN ivf
        ON ivf.query_vec_id = b.query_vec_id AND ivf.vec_id = b.vec_id
      GROUP BY 1)
SELECT query_vec_id, CAST({_ANN_K} AS BIGINT) AS k, n_overlap,
       CAST(n_overlap * 1000000 // {_ANN_K} AS BIGINT) AS recall_ppm
FROM m
"""
    from freemap_tiler_ray.pipelines.queries import LATE_ALLOWED_S
    sqls["late_events"] = f"""
WITH a AS (SELECT user_id, event_id,
                  epoch_us(ts) // 1000000 AS ts_s FROM events),
w AS (SELECT user_id, ts_s,
             MAX(ts_s) OVER (PARTITION BY user_id
                             ORDER BY event_id) AS wm
      FROM a)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN wm - ts_s > {LATE_ALLOWED_S}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(max(wm - ts_s) AS BIGINT) AS max_late_s
FROM w GROUP BY user_id
"""
    sqls["revenue_contribution"] = """
WITH a AS (SELECT c.c_nationkey AS nk,
                  CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                       AS BIGINT) AS revenue_c
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY 1),
m AS (SELECT r.r_name AS region, n.n_name AS nation, a.revenue_c
      FROM a JOIN nation n ON n.n_nationkey = a.nk
      JOIN region r ON r.r_regionkey = n.n_regionkey),
t AS (SELECT region, CAST(sum(revenue_c) AS BIGINT) AS tot
      FROM m GROUP BY region)
SELECT m.region, m.nation, m.revenue_c,
       CAST(m.revenue_c * 1000000 // t.tot AS BIGINT) AS share_ppm
FROM m JOIN t USING (region)
"""
    sqls["source_overlap"] = """
WITH tok AS (SELECT DISTINCT source, tok FROM (
       SELECT source, unnest(string_split(text, ' ')) AS tok
       FROM documents)),
v AS (SELECT source, CAST(count(*) AS BIGINT) AS v
      FROM tok GROUP BY 1),
p AS (SELECT a.source AS src_a, b.source AS src_b,
             CAST(count(*) AS BIGINT) AS n_common
      FROM tok a JOIN tok b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2)
SELECT p.src_a, p.src_b, p.n_common, va.v AS vocab_a, vb.v AS vocab_b,
       CAST(p.n_common * 1000000
            // (va.v + vb.v - p.n_common) AS BIGINT) AS jaccard_ppm
FROM p JOIN v va ON va.source = p.src_a
       JOIN v vb ON vb.source = p.src_b
"""
    sqls["backlog_curve"] = """
WITH last AS (SELECT l_orderkey,
                     max(epoch_us(l_shipdate) // 86400000000) AS ed
              FROM lineitem GROUP BY 1),
o AS (SELECT epoch_us(o.o_orderdate) // 86400000000 AS sd,
             last.ed + 1 AS ed1
      FROM orders o JOIN last ON last.l_orderkey = o.o_orderkey),
d AS (SELECT sd AS day, 1 AS delta FROM o
      UNION ALL SELECT ed1, -1 FROM o),
g AS (SELECT day, CAST(sum(delta) AS BIGINT) AS delta
      FROM d GROUP BY day)
SELECT CAST(day AS BIGINT) AS day,
       CAST(SUM(delta) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM g
"""
    sqls["median_gap"] = """
WITH a AS (SELECT user_id, event_id,
                  epoch_us(ts) // 1000000 AS ts_s FROM events),
g AS (SELECT user_id,
             ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                    ORDER BY ts_s, event_id) AS gap
      FROM a),
r AS (SELECT user_id, gap,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY gap) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n
      FROM g WHERE gap IS NOT NULL)
SELECT user_id, CAST(max(n) AS BIGINT) AS n_gaps,
       CAST(min(CASE WHEN 2 * rn >= n THEN gap END) AS BIGINT)
         AS median_gap_s
FROM r GROUP BY user_id
"""

    sqls["scd_intervals"] = """
WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
                  CAST(floor(value * 1000) AS BIGINT) AS vm FROM events),
c AS (SELECT *, lag(vm) OVER (PARTITION BY user_id, event_type
                              ORDER BY us, event_id) AS pv FROM e),
ch AS (SELECT user_id, event_type, vm, us, event_id FROM c
       WHERE pv IS NULL OR pv <> vm)
SELECT user_id, event_type, vm, us AS valid_from_us,
       COALESCE(lead(us) OVER (PARTITION BY user_id, event_type
                               ORDER BY us, event_id),
                9223372036854775807) AS valid_to_us
FROM ch
"""

    sqls["nearest_order_join"] = """
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us FROM events),
o AS (SELECT o_custkey, epoch_us(o_orderdate) AS us FROM orders),
j AS (SELECT e.event_id, o.us AS o_us, abs(e.us - o.us) AS dt,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY abs(e.us - o.us), o.us) AS rn
      FROM e JOIN o ON e.user_id = o.o_custkey)
SELECT event_id, o_us AS nearest_order_us, CAST(dt AS BIGINT) AS abs_dt_us
FROM j WHERE rn = 1
"""

    sqls["cell_clusters"] = f"""
WITH RECURSIVE {_PTS_CTE}, {cell_expr},
occ AS (SELECT DISTINCT cell_x, cell_y FROM cells),
ids AS (SELECT cell_x * 64 + cell_y AS id, cell_x, cell_y FROM occ),
edge AS (SELECT a.id AS src, b.id AS dst
         FROM ids a JOIN ids b
           ON abs(a.cell_x - b.cell_x) <= 1
          AND abs(a.cell_y - b.cell_y) <= 1
          AND a.id <> b.id),
lab AS (SELECT id, id AS lbl FROM ids
        UNION
        SELECT e.src AS id, lab.lbl
        FROM lab JOIN edge e ON lab.id = e.dst)
SELECT i.cell_x, i.cell_y, CAST(min(l.lbl) AS BIGINT) AS cluster
FROM lab l JOIN ids i ON i.id = l.id
GROUP BY i.cell_x, i.cell_y
"""

    # resumed sink == fresh truth: the oracle IS the plain cell_counts
    # aggregate, so the driver value-hash proves resume correctness
    sqls["resume_cell_counts"] = sqls["cell_counts"]

    return sqls
