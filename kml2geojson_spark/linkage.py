"""Record linkage / entity resolution over structured records.

The document-side near-dedup stack (SimHash/MinHash → components,
textops.py) answers "which TEXTS are near-copies"; this module answers
the RECORD question — "which rows describe the same entity" — with the
classic three-stage shape every ER system at scale uses:

  1. **blocking** — candidate pairs only WITHIN a cheap equi-key
     (never all-pairs; oversized blocks are excluded, not exploded),
  2. **scoring** — Fellegi–Sunter-style additive field-agreement
     weights in exact integer milli-units (a float log-odds sum would
     never hash-replay),
  3. **clustering** — threshold the scores into match edges and run
     the O(log² n) star connected components; every record gets an
     entity id (its component's minimum record id; singletons map to
     themselves).

Reference scope note: the reference library (kml2geojson) has no
record-linkage surface — this is part of the training-data-pipeline
extension mandated by the engine brief (SURVEY.md §2.4), same charter
as textops.near_dedup_representatives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["block_candidate_pairs", "linkage_scores",
           "resolve_entities"]


def block_candidate_pairs(records: DataFrame, *, id_col: str,
                          block_cols: list[str],
                          max_block: int = 1000) -> DataFrame:
    """Candidate pairs via exact blocking: all unordered record pairs
    that share the block key, for blocks of at most ``max_block``
    rows. Blocks LARGER than the cap are dropped whole (their rows
    surface as singletons downstream) — the deterministic, documented
    alternative to letting one degenerate key (NULL-ish city, empty
    phone) produce a quadratic explosion; same discipline as
    ``common_neighbor_similarity``'s max_degree. Rows with a NULL id
    or any NULL block column never pair (NULL is not evidence two
    records match).

    Scale shape: one block-key hash-agg for sizes, one equi-join to
    keep small blocks, one block-key self-equi-join with an id<id
    filter — shuffles stay on the block key; nothing all-pairs, no
    window. Output: (id_a, id_b), id_a < id_b.
    """
    if max_block < 2:
        raise ValueError("max_block must be >= 2")
    cond = F.col(id_col).isNotNull()
    for c in block_cols:
        cond = cond & F.col(c).isNotNull()
    r = records.where(cond).select(id_col, *block_cols)
    sizes = (r.groupBy(*block_cols)
             .agg(F.count(F.lit(1)).alias("_bn"))
             .where(F.col("_bn") <= max_block)
             .drop("_bn"))
    b = r.join(sizes, block_cols)
    left = b.select(*block_cols, F.col(id_col).alias("id_a"))
    right = b.select(*block_cols, F.col(id_col).alias("id_b"))
    return (left.join(right, block_cols)
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b"))


def linkage_scores(pairs: DataFrame, records: DataFrame, *,
                   id_col: str,
                   fields: list[tuple[str, int, int]]) -> DataFrame:
    """Fellegi–Sunter-style additive agreement score per candidate
    pair: for each ``(column, w_agree_milli, w_disagree_milli)`` the
    pair earns w_agree if both sides are non-NULL and equal,
    w_disagree if both sides are non-NULL and different, and 0 when
    either side is NULL (absence is no evidence either way — the
    standard missing-at-random convention). Weights are caller-chosen
    integer milli-units (log-odds ·1000 in a real deployment,
    estimated offline); the sum is an exact BIGINT so every engine
    reproduces it.

    Scale shape: two id-key equi-joins of the pair list to the
    (projected) record table, then a pure-Column CASE sum — no agg,
    no window, no Python. Output: (id_a, id_b, score_milli).
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    cols = [c for c, _, _ in fields]
    la = records.select(F.col(id_col).alias("id_a"),
                        *[F.col(c).alias(f"_a_{c}") for c in cols])
    lb = records.select(F.col(id_col).alias("id_b"),
                        *[F.col(c).alias(f"_b_{c}") for c in cols])
    j = pairs.join(la, "id_a").join(lb, "id_b")
    score = F.lit(0).cast("long")
    for c, w_agree, w_disagree in fields:
        a, b = F.col(f"_a_{c}"), F.col(f"_b_{c}")
        score = score + (
            F.when(a.isNull() | b.isNull(), F.lit(0))
            .when(a == b, F.lit(int(w_agree)))
            .otherwise(F.lit(int(w_disagree))).cast("long"))
    return j.select("id_a", "id_b", score.alias("score_milli"))


def resolve_entities(records: DataFrame, *, id_col: str,
                     block_cols: list[str],
                     fields: list[tuple[str, int, int]],
                     threshold_milli: int,
                     max_block: int = 1000) -> DataFrame:
    """One-call entity resolution: blocking → integer agreement
    scoring → threshold match edges → star connected components →
    (record_id, entity_id) for EVERY input record with a non-NULL id
    (records that never matched — including rows from dropped
    oversized blocks or with NULL block keys — are their own entity).
    entity_id = the minimum record id of the match-component, so ids
    are stable under repartitioning and re-runs.

    The record twin of ``textops.near_dedup_representatives`` (same
    edges→components→representative contract), using the
    diameter-independent star components — ER chains (A≈B≈C…) are
    exactly the long-path shape that breaks min-label propagation.
    """
    pairs = block_candidate_pairs(records, id_col=id_col,
                                  block_cols=block_cols,
                                  max_block=max_block)
    scored = linkage_scores(pairs, records, id_col=id_col,
                            fields=fields)
    matches = scored.where(
        F.col("score_milli") >= int(threshold_milli))
    from .graph import connected_components_star
    comp = connected_components_star(matches, src="id_a", dst="id_b")
    ids = (records.where(F.col(id_col).isNotNull())
           .select(F.col(id_col).alias("record_id")).distinct())
    return (ids.join(comp.withColumnRenamed("node", "record_id"),
                     "record_id", "left")
            .select("record_id",
                    F.coalesce(F.col("component"),
                               F.col("record_id")).alias("entity_id")))
