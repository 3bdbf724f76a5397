"""kNN join via expanding cell-ring search.

Spark translation of the reference's nearest-neighbor grid search
(/root/reference/alg/gdalgrid.cpp:905-982): a quadtree bbox query whose
radius doubles until a hit, followed by a min-distance scan of candidates.
Here the 'quadtree' is the uniform mercator cell grid: each round joins the
still-unresolved queries against candidates within Chebyshev cell radius r
(disk join on cell keys, JVM-side sequence/explode), keeps queries whose
k-th nearest distance is provably final, and doubles r for the rest.

Correctness bound: the grid is exactly uniform in mercator meters, and any
candidate outside disk r is at least (r) full cells away, i.e. at planar
distance >= r * cell_size. So once kth_dist <= r * cell_size, no farther
ring can change the answer — same guarantee the reference gets from its
radius-doubling quadtree search, made set-based.

Scale: each round is one shuffle join keyed by cells; the resolved fraction
leaves the loop, so dense regions resolve at r=1 (most of the planet for
10^12 points) and only sparse-region stragglers pay bigger disks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import cells as C
from ..oracle import mercator as M


def _knn_broadcast(pts: DataFrame, candidates, k: int,
                   point_id: str, cand_id: str) -> DataFrame:
    """Map-only kNN against a driver-collected (bounded) candidate frame
    (a pandas DataFrame with _cid/_cx/_cy, already length-verified by the
    caller): numpy distance matrix per Arrow batch, argpartition top-k,
    ties broken by candidate id exactly like the ring search / brute-force
    oracle."""
    import numpy as np
    import pandas as pd

    cpdf = candidates.sort_values("_cid", ignore_index=True)
    cx = cpdf["_cx"].to_numpy()
    cy = cpdf["_cy"].to_numpy()
    cid = cpdf["_cid"].to_numpy()
    kk = min(k, len(cid))

    def gen(batches):
        for b in batches:
            if len(b) == 0:
                continue
            # chunk so the distance matrix stays ~5e7 doubles
            step = max(1, int(5e7 // max(len(cid), 1)))
            for lo in range(0, len(b), step):
                sub = b.iloc[lo : lo + step]
                qx = sub["_qx"].to_numpy()[:, None]
                qy = sub["_qy"].to_numpy()[:, None]
                d2 = (qx - cx[None, :]) ** 2 + (qy - cy[None, :]) ** 2
                if kk < len(cid):
                    part = np.argpartition(d2, kk - 1, axis=1)[:, :kk]
                else:
                    part = np.broadcast_to(np.arange(len(cid)),
                                           (len(sub), len(cid))).copy()
                rows = np.arange(len(sub))[:, None]
                dd = np.sqrt(d2[rows, part])
                # candidates were id-sorted on collect, so sorting the
                # (dist, index) pair reproduces the (dist, cid) tie-break
                pairkeys = np.rec.fromarrays([dd, part], names="d,i")
                ord_ = np.argsort(pairkeys, axis=1, order=("d", "i"))
                sel = part[rows, ord_]
                dsel = dd[rows, ord_]
                out = pd.DataFrame({
                    "_qid": np.repeat(sub["_qid"].to_numpy(), kk),
                    "_cid": cid[sel].ravel(),
                    "_dist": dsel.ravel(),
                    "_rank": np.tile(np.arange(1, kk + 1), len(sub)),
                })
                yield out

    schema_id = pts.schema["_qid"].dataType.simpleString()
    cid_t = cpdf["_cid"].dtype
    cid_ddl = "string" if cid_t == object else "bigint"
    res = pts.mapInPandas(
        gen,
        schema=f"_qid {schema_id}, _cid {cid_ddl}, _dist double, _rank int",
    )
    return res.select(
        F.col("_qid").alias(point_id),
        F.col("_cid").alias(cand_id),
        F.col("_dist").alias("dist_m"),
        F.col("_rank").alias("rank"),
    )


def knn_join(points: DataFrame, candidates: DataFrame, k: int,
             zoom: int | None = None,
             point_id: str = "pid", cand_id: str = "sid",
             plon: str = "lon", plat: str = "lat",
             clon: str = "lon", clat: str = "lat",
             max_rounds: int = 8,
             broadcast_cap: int | None = 100_000) -> DataFrame:
    """For each point, its k nearest candidates by planar mercator distance.

    Returns (point_id, cand_id, dist_m, rank) with rank in [1, k]; ties
    broken by candidate id (deterministic, matches the brute-force oracle).

    ``zoom=None`` picks the grid so cells average ~max(4, k) candidates:
    dense grids waste rounds doubling through empty cells, coarse grids
    over-gather — the same density trade the reference's quadtree leaf
    size makes (alg/gdalgrid.cpp quadtree bucket sizing).
    """
    if broadcast_cap:
        # Dimension-table fast path probe: collect AT MOST cap+1 candidate
        # rows (limit pushes down, so an over-cap table terminates the scan
        # early and the driver never holds more than cap+1 rows).  If the
        # table fits, the probe IS the broadcast payload — no separate
        # count scan — and the explicit length check means a count
        # underestimate can never route an over-cap table into a driver
        # collect.
        probe = candidates.select(
            F.col(cand_id).alias("_cid"),
            C.mercator_x(clon).alias("_cx"),
            C.mercator_y(clat).alias("_cy"),
        ).limit(broadcast_cap + 1).toPandas()
        if len(probe) <= broadcast_cap:
            # the candidate set fits in one task's memory, so broadcast it
            # into a MAP-ONLY Arrow kernel — zero shuffles, every point
            # resolved in one pass (the small-dataset branch the reference
            # takes before building a quadtree; alg/gdalgrid.cpp
            # GDALGridNearestNeighbor direct scan).  At 10^12 points this
            # is the right plan whenever candidates are a dimension table;
            # the ring search below remains the both-sides-large path.
            pts = points.select(
                F.col(point_id).alias("_qid"),
                C.mercator_x(plon).alias("_qx"),
                C.mercator_y(plat).alias("_qy"),
            )
            return _knn_broadcast(pts, probe, k, point_id, cand_id)
    if zoom is None:
        # approximate count with a bounded time budget: the exact row count
        # only tunes the grid density heuristic, and a full count() of the
        # candidate table is a wasted scan at corpus scale (an
        # underestimate just coarsens the grid -> more candidates per
        # cell, still correct)
        n_cand = int(
            candidates.select(cand_id).rdd.countApprox(
                timeout=2000, confidence=0.90
            )
        )
        import math

        target = max(4, 2 * k)
        zoom = max(0, min(12, int(math.log(max(n_cand, 1) / target, 4))))
    cell_m = float(M.resolution(zoom)) * M.TILE_SIZE
    n_tiles = 2 ** zoom

    z = str(zoom)
    pts = points.select(
        F.col(point_id).alias("_qid"),
        C.mercator_x(plon).alias("_qx"),
        C.mercator_y(plat).alias("_qy"),
        C.tile_x(plon, z).alias("_qtx"),
        C.tile_y_tms(plat, z).alias("_qty"),
    )
    cand = candidates.select(
        F.col(cand_id).alias("_cid"),
        C.mercator_x(clon).alias("_cx"),
        C.mercator_y(clat).alias("_cy"),
        C.tile_x(clon, z).alias("_ctx"),
        C.tile_y_tms(clat, z).alias("_cty"),
    )
    # candidate side is reused every round — cache it keyed by cell
    cand = cand.persist()

    remaining = pts.persist()
    done_parts = []
    r = 1
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        # wrap x across the antimeridian (periodic grid), clamp y at the
        # poles; array_distinct prevents duplicate cells once 2r+1 wraps
        # past the grid width (would double-count candidates in top-k)
        exploded = (
            remaining
            .withColumn(
                "_jtx",
                F.explode(F.array_distinct(F.expr(
                    f"transform(sequence({-r}, {r}), d -> pmod(_qtx + d, {n_tiles}))"
                ))),
            )
            .withColumn(
                "_jty",
                F.explode(F.array_distinct(F.expr(
                    f"filter(transform(sequence({-r}, {r}), d -> _qty + d),"
                    f" v -> v >= 0 AND v < {n_tiles})"
                ))),
            )
        )
        pairs = exploded.join(
            cand,
            (exploded["_jtx"] == cand["_ctx"]) & (exploded["_jty"] == cand["_cty"]),
            "inner",
        ).select(
            "_qid", "_cid",
            F.sqrt(
                (F.col("_qx") - F.col("_cx")) ** 2
                + (F.col("_qy") - F.col("_cy")) ** 2
            ).alias("_dist"),
        )
        w = Window.partitionBy("_qid").orderBy(F.col("_dist").asc(), F.col("_cid").asc())
        topk = (
            pairs.withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= k)
        )
        stats = topk.groupBy("_qid").agg(
            F.count("*").alias("_cnt"), F.max("_dist").alias("_kth")
        )
        final_round = r >= n_tiles or rounds == max_rounds
        if final_round:
            resolved_ids = stats.select("_qid")
        else:
            resolved_ids = stats.where(
                (F.col("_cnt") >= k) & (F.col("_kth") <= r * cell_m)
            ).select("_qid")
        resolved_ids = resolved_ids.persist()
        done_parts.append(
            topk.join(resolved_ids, "_qid", "left_semi")
            .select("_qid", "_cid", "_dist", "_rank")
            .persist()
        )
        new_remaining = remaining.join(resolved_ids, "_qid", "left_anti").persist()
        if final_round or new_remaining.isEmpty():
            remaining.unpersist()
            remaining = new_remaining
            break
        remaining.unpersist()
        remaining = new_remaining
        r *= 2

    out = done_parts[0]
    for p in done_parts[1:]:
        out = out.unionByName(p)
    return out.select(
        F.col("_qid").alias(point_id),
        F.col("_cid").alias(cand_id),
        F.col("_dist").alias("dist_m"),
        F.col("_rank").alias("rank"),
    )
