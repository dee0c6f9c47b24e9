"""Scale-tier DuckDB oracles for the five gates whose CANONICAL
oracles are deliberately brute-force (all-pairs, O(N^2)) and therefore
cannot run at the 10x fixture (50k docs -> 2.5e9 pairs).

The canonical brute-force oracles remain the committed-SF proof: they
independently validate that Spark's candidate filters (PPJoin prefix,
simhash pigeonhole blocking, asymmetric containment prefix) are
LOSSLESS, because they enumerate every pair with no filter at all.
These scale variants keep the oracle exact but restrict enumeration by
a mathematically lossless identity, so the same bit-exact comparison
extends to 10x:

- jaccard/containment/minhash-truth: any pair above a positive overlap
  threshold shares >= 1 shingle, so a shingle-posting equi-join with a
  per-pair shared count enumerates a superset of the answer exactly
  (measured at 10x: 138M posting pair-rows, hottest shingle 250 docs).
  The count(*) over the join IS |a INTERSECT b| because the shingle
  lists are list_distinct.
- hamming pigeonhole: hamming(x, y) <= d means at most d bit flips, so
  splitting the hash into d+1 chunks leaves >= 1 chunk equal (simhash:
  2 x 16 bits for d=1; ahash: 11/11/10 bits for d=2). The chunk
  equi-join is a lossless candidate cut; the final filter recomputes
  the exact hamming distance.

These are NOT the driver's oracles (oracle_sql() still serves the
brute-force SQL at sf0.01); tools/check_parity.py overlays them only
when --scale-oracles is passed, and docs/CERT10X.json records which
gates were certified through this tier ("oracle": "scale-tier").
"""

from __future__ import annotations

_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# shared CTE text: distinct 3-shingles + posting-join pair intersection
# counts (a < b). Identical normalization/shingling text to the
# canonical oracles (queries._NORM_SQL / _shingle_sql(3)).
_POSTING_PAIRS = f"""
    nd AS (
      SELECT doc_id, regexp_split_to_array({_NORM}, ' ') AS nws FROM documents),
    sh AS (
      SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(nws) - 2, 1) + 1),
             i -> array_to_string(list_slice(nws, i, i + 2), ' '))) AS s
      FROM nd),
    ex AS (SELECT doc_id, unnest(s) AS tok FROM sh),
    lens AS (SELECT doc_id, len(s) AS ln FROM sh),
    cand AS (
      SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS si
      FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
"""

SCALE_ORACLES: dict[str, str] = {}

SCALE_ORACLES["prefix_filter_jaccard_pairs"] = f"""
    WITH {_POSTING_PAIRS}
    SELECT c.a, c.b,
           round(c.si::DOUBLE / (la.ln + lb.ln - c.si), 4) AS jaccard
    FROM cand c JOIN lens la ON la.doc_id = c.a JOIN lens lb ON lb.doc_id = c.b
    WHERE round(c.si::DOUBLE / (la.ln + lb.ln - c.si), 4) >= 0.5
"""

# directed containment: emit both orientations of each undirected
# candidate; threshold/round arithmetic identical to the canonical SQL
# (len(a.sh) > 0, unrounded filter, rounded publish)
SCALE_ORACLES["doc_containment_pairs"] = f"""
    WITH {_POSTING_PAIRS},
    dir AS (
      SELECT a, b, si FROM cand
      UNION ALL
      SELECT b AS a, a AS b, si FROM cand)
    SELECT d.a, d.b, round(d.si::DOUBLE / la.ln, 4) AS containment
    FROM dir d JOIN lens la ON la.doc_id = d.a
    WHERE la.ln > 0 AND d.si::DOUBLE >= la.ln * 0.7
"""

_SIMHASH_CTES = """
    sh0 AS (WITH w AS (
      SELECT DISTINCT doc_id, w
      FROM (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))) AS w FROM documents)),
    wb AS (
      SELECT doc_id, w, unnest(range(32)) AS pos FROM w),
    bits AS (
      SELECT doc_id, pos,
             (((strpos('0123456789abcdef', substr(md5(w), (pos // 4) + 1, 1)) - 1) >> (pos % 4)) & 1) * 2 - 1 AS contrib
      FROM wb),
    sums AS (
      SELECT doc_id, pos, sum(contrib) AS s FROM bits GROUP BY doc_id, pos)
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << pos ELSE 0 END) AS BIGINT) AS simhash
    FROM sums GROUP BY doc_id),
    sh AS (SELECT * FROM sh0
           WHERE bit_count(simhash) > 0 AND bit_count(simhash) < 32)
"""

# simhash_hamming_pairs / image_ahash_pairs: formerly string entries
# here; since r12 they are STAGED CALLABLES (end of this module) - the
# string forms re-evaluated the hash pipelines per plain-CTE reference
# and spilled >51 GB at 100x.


def _minhash_eval_scale() -> str:
    """minhash_eval_report with ONLY the ground-truth CTE swapped to
    the posting-join form; the detection side (band equi-joins) scales
    as-is, so it is reused verbatim from the canonical oracle — except
    both CTEs become MATERIALIZED: the final SELECT references each of
    truth/det five times, and DuckDB inlines plain CTEs, so at 10x the
    un-materialized form evaluates the full band-join pipeline five
    times and spills >75 GB of temp (observed: filled the disk)."""
    from meteor_spark.queries import ORACLES

    canonical = ORACLES["minhash_eval_report"]
    start = canonical.index("WITH truth AS (")
    end = canonical.index("det AS (")
    truth = f"""WITH truth AS MATERIALIZED (
    WITH {_POSTING_PAIRS}
    SELECT c.a, c.b,
           round(c.si::DOUBLE / (la.ln + lb.ln - c.si), 4) AS jaccard
    FROM cand c JOIN lens la ON la.doc_id = c.a JOIN lens lb ON lb.doc_id = c.b
    WHERE round(c.si::DOUBLE / (la.ln + lb.ln - c.si), 4) >= 0.5
    ),
"""
    return (
        canonical[:start]
        + truth
        + canonical[end:].replace("det AS (", "det AS MATERIALIZED (", 1)
    )


SCALE_ORACLES["minhash_eval_report"] = _minhash_eval_scale()


# document_pareto_frontier: the canonical oracle is the O(N^2)
# NOT-EXISTS dominance DEFINITION — at the 10x fixture that is a
# ~2.5e9-pair nested loop on the oracle side. The scale tier restates
# dominance with the two-window identity (dominated iff the max y over
# strictly-greater x is >= y, or the max y among equal x is > y) —
# O(N log N). Validated equal to the canonical form at sf0.001 and
# sf0.01 before first 10x use (tests/test_parity_tool.py pins the
# equivalence at sf0.01 on every run).
SCALE_ORACLES["document_pareto_frontier"] = f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(regexp_split_to_array({_NORM}, ' ')) AS BIGINT) AS tc,
         CAST(len(list_distinct(regexp_split_to_array({_NORM}, ' ')))
              AS BIGINT) AS uq
  FROM documents),
p AS (SELECT doc_id, tc,
             CAST((uq // tc) * 1000000
                  + (((uq % tc) * 1000) // tc) * 1000
                  + ((((uq % tc) * 1000) % tc) * 1000) // tc
                  AS BIGINT) AS uniq_ppm
      FROM m),
d AS (
  SELECT doc_id, tc, uniq_ppm,
         max(uniq_ppm) OVER (ORDER BY tc ASC
                             RANGE BETWEEN 1 FOLLOWING
                                   AND UNBOUNDED FOLLOWING) AS m_gt,
         max(uniq_ppm) OVER (PARTITION BY tc) AS m_eq
  FROM p)
SELECT doc_id, tc, uniq_ppm
FROM d
WHERE (m_gt IS NULL OR m_gt < uniq_ppm) AND m_eq = uniq_ppm
"""


# ---------------------------------------------------------------------------
# Callable oracle tier (round 10): the near-dup CHAIN-END gates at 100x.
#
# The six gates below consume the banded-minhash verified pairs and their
# transitive closure. Two things made their string oracles infeasible at
# the 100x fixture (500k docs, every doc in a 100-clone family):
#   1. the `reach` recursive CTE materializes ALL (node, reachable) pairs
#      — Sum(component^2) rows, ~50M+ at 100x, re-unioned per iteration;
#   2. plain CTE nesting re-evaluates the band-join pipeline per
#      reference.
# A callable oracle keeps every stage EXACT (the SQL text of each stage
# is imported from meteor_spark.queries, so the shingle/signature/band/
# verify arithmetic is the canonical text run once into TEMP tables) and
# replaces only the closure ALGORITHM: min-label propagation — one
# edge-join per iteration, O(E * diameter) instead of O(Sum(comp^2)) —
# run as a Python loop over temp tables. The fixpoint (min node id per
# component) is the same unique object the recursive CTE defines.
#
# tools/check_parity.py runs these when --scale-oracles is passed; cache/
# ledger keys use the md5 of THIS MODULE's source, so any edit here
# invalidates every callable's cached oracle result.
# ---------------------------------------------------------------------------

SCALE_ORACLE_FNS: dict = {}

# one heavy-state build per (connection, fixture): the six gates share the
# verified-pair and label temp tables within a sweep
_MS_BUILT: dict[int, str] = {}
_TR_BUILT: dict[int, str] = {}
_PS_BUILT: dict[int, tuple] = {}


def _build_posting_arrays(con, ent_sql: str, sz_sql: str):
    """Numpy posting arrays from a (doc_id, gid) entity query and a
    (doc_id, sz) size query: (doc_ids, sizes, post_indptr, post_docs,
    starts, ends, g_sorted) — the input shape of
    operators.dedup._posting_pair_counts_block."""
    import numpy as np

    ent = con.sql(ent_sql).arrow()
    sz = con.sql(sz_sql).arrow()
    doc_ids = sz["doc_id"].to_numpy()
    sizes = sz["sz"].to_numpy().astype(np.int32)
    idx_of = {int(d): i for i, d in enumerate(doc_ids)}
    e_doc = np.fromiter(
        (idx_of[int(d)] for d in ent["doc_id"].to_numpy()),
        dtype=np.int64,
        count=len(ent),
    )
    e_gid = ent["gid"].to_numpy().astype(np.int64)
    order = np.lexsort((e_doc, e_gid))
    e_doc, e_gid = e_doc[order], e_gid[order]
    n_grams = int(e_gid.max()) + 1 if len(e_gid) else 0
    post_indptr = np.zeros(n_grams + 1, dtype=np.int64)
    np.add.at(post_indptr, e_gid + 1, 1)
    post_indptr = np.cumsum(post_indptr)
    post_docs = e_doc.astype(np.int32)
    # per-doc gram lists, in doc-index order
    by_doc = np.argsort(e_doc, kind="stable")
    d_sorted, g_sorted = e_doc[by_doc], e_gid[by_doc]
    starts = np.searchsorted(d_sorted, np.arange(len(doc_ids)))
    ends = np.searchsorted(d_sorted, np.arange(len(doc_ids)), side="right")
    return (doc_ids, sizes, post_indptr, post_docs, starts, ends, g_sorted)


def _posting_state(con):
    """Shared numpy posting arrays over the canonical ms_sh shingles.
    Built once per (connection, fixture) — the Jaccard truth table
    (tr_true) and the containment callable both consume it, and at 100x
    the gram-id assignment + lexsort is the expensive half of either."""
    tok = _fixture_token(con)
    hit = _PS_BUILT.get(id(con))
    if hit and hit[0] == tok:
        return hit[1]
    _ensure_minhash_state(con)
    state = _build_posting_arrays(
        con,
        """
        WITH ex AS (SELECT doc_id, unnest(sh) AS tok FROM ms_sh),
        d AS (SELECT tok, row_number() OVER (ORDER BY tok) - 1 AS gid
              FROM (SELECT DISTINCT tok FROM ex))
        SELECT e.doc_id, d.gid FROM ex e JOIN d USING (tok)
        """,
        "SELECT doc_id, len(sh) AS sz FROM ms_sh ORDER BY doc_id",
    )
    _PS_BUILT[id(con)] = (tok, state)
    return state


def _fixture_token(con) -> str:
    return str(con.sql(
        "SELECT count(*), min(doc_id), max(doc_id), sum(n_chars) FROM documents"
    ).fetchone())


def _ensure_minhash_state(con) -> None:
    """TEMP tables ms_sh(doc_id, sh), ms_verified(a, b, jaccard>=0.5),
    cc_l(node, lbl = min doc_id of the component)."""
    tok = _fixture_token(con)
    if _MS_BUILT.get(id(con)) == tok:
        return
    from meteor_spark.queries import (
        _BAND_SQL,
        _HS_SQL,
        _MINHASH_BANDS,
        _MINHASH_K,
        _NORM_SQL,
        _SIG_SQL,
        _shingle_sql,
    )

    for t in ("ms_sh", "ms_bands", "ms_cand", "ms_verified", "cc_e", "cc_l"):
        con.execute(f"DROP TABLE IF EXISTS {t}")
    # canonical _MINHASH_CTES stages, one temp table each (same SQL text)
    con.execute(f"""
        CREATE TEMP TABLE ms_sh AS
        WITH nd AS (
          SELECT doc_id, regexp_split_to_array({_NORM_SQL}, ' ') AS nws
          FROM documents)
        SELECT doc_id, {_shingle_sql(_MINHASH_K)} AS sh FROM nd""")
    con.execute(f"""
        CREATE TEMP TABLE ms_bands AS
        WITH hs AS (SELECT doc_id, sh, {_HS_SQL} AS hs FROM ms_sh),
        sig AS (SELECT doc_id, sh, [{_SIG_SQL}] AS sig FROM hs)
        SELECT doc_id, {_BAND_SQL} FROM sig""")
    band_joins = " UNION ALL ".join(
        f"""SELECT a.doc_id AS a, b.doc_id AS b
            FROM ms_bands a JOIN ms_bands b
              ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"""
        for b in range(_MINHASH_BANDS)
    )
    con.execute(f"CREATE TEMP TABLE ms_cand AS SELECT DISTINCT a, b FROM ({band_joins})")
    con.execute("""
        CREATE TEMP TABLE ms_verified AS
        SELECT * FROM (
          SELECT p.a, p.b,
                 round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                       / len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
          FROM ms_cand p
          JOIN ms_sh x ON x.doc_id = p.a
          JOIN ms_sh y ON y.doc_id = p.b)
        WHERE jaccard >= 0.5""")
    con.execute("DROP TABLE ms_bands")
    con.execute("DROP TABLE ms_cand")
    # min-label propagation to the closure fixpoint
    con.execute("""
        CREATE TEMP TABLE cc_e AS
        SELECT a AS s, b AS d FROM ms_verified
        UNION
        SELECT b AS s, a AS d FROM ms_verified""")
    con.execute("""
        CREATE TEMP TABLE cc_l AS
        SELECT s AS node, least(s, min(d)) AS lbl FROM cc_e GROUP BY s""")
    for _ in range(200):
        con.execute("""
            CREATE TEMP TABLE cc_l2 AS
            SELECT l.node, least(l.lbl, coalesce(nb.m, l.lbl)) AS lbl
            FROM cc_l l LEFT JOIN (
              SELECT e.d AS node, min(x.lbl) AS m
              FROM cc_e e JOIN cc_l x ON x.node = e.s
              GROUP BY e.d) nb ON nb.node = l.node""")
        changed = con.sql(
            "SELECT count(*) FROM cc_l2 j JOIN cc_l o ON j.node = o.node "
            "WHERE j.lbl <> o.lbl"
        ).fetchone()[0]
        con.execute("DROP TABLE cc_l")
        con.execute("ALTER TABLE cc_l2 RENAME TO cc_l")
        if changed == 0:
            break
    else:
        raise RuntimeError("cc label propagation did not converge in 200 rounds")
    _MS_BUILT[id(con)] = tok


def _ensure_truth_state(con) -> None:
    """TEMP table tr_true(a, b): ALL pairs with round(jaccard,4) >= 0.5 —
    the minhash_eval_report ground truth — via the BLOCKED POSTING
    MULTIPLICATION core (operators.dedup._posting_true_pairs_block).

    Why not SQL here: the full posting join is 13.9B pair-rows at 100x,
    and even the Bayardo/Xiao prefix-filter cut leaves 4.84B raw
    matches / 2B+ DISTINCT candidates on the clone fixture (measured;
    the aggregation hash OOM-killed the process) — candidate
    MATERIALIZATION is the wall, and the bincount core never
    materializes candidates. The shingle sets still come from the
    canonical ms_sh temp table (DuckDB text of the canonical CTEs);
    numpy only concatenates posting tails and bincounts.

    Independence caveat, stated plainly: this core is SHARED with the
    Spark truth arm. The arithmetic it implements is pinned against two
    independent formulations (brute-force oracle, PPJoin prefix join)
    at sf0.001/sf0.01 in tests/test_dedup.py; what the 100x gate then
    cross-checks is the two engines' full LSH detection pipelines
    against a truth whose construction is validated at committed SF."""
    tok = _fixture_token(con)
    if _TR_BUILT.get(id(con)) == tok:
        return
    import numpy as np

    from meteor_spark.operators.dedup import _posting_true_pairs_block

    doc_ids, sizes, post_indptr, post_docs, starts, ends, g_sorted = _posting_state(con)
    con.execute("DROP TABLE IF EXISTS tr_true")
    a_list, b_list = [], []
    for a, b, _ in _posting_true_pairs_block(
        range(len(doc_ids)),
        (g_sorted[s:e] for s, e in zip(starts, ends)),
        post_indptr,
        post_docs,
        sizes,
        0.5,
        4,
    ):
        a_list.append(int(doc_ids[a]))
        b_list.append(int(doc_ids[b]))
    import pandas as pd

    tr = pd.DataFrame({"a": np.asarray(a_list, dtype=np.int64),
                       "b": np.asarray(b_list, dtype=np.int64)})
    con.register("__tr_pairs", tr)
    con.execute("CREATE TEMP TABLE tr_true AS SELECT a, b FROM __tr_pairs")
    con.unregister("__tr_pairs")
    # INDEPENDENT ARM (r10 advice): the bincount core above is shared
    # with the Spark truth arm, so a deterministic 5-doc sample gets its
    # COMPLETE partner set re-derived in pure SQL — the canonical
    # list_intersect/list_distinct formulation, no numpy — and the two
    # sets must match exactly (both directions: a pair the core missed
    # AND a pair it invented both fail). Cost: one posting equi-join
    # restricted to 5 docs.
    bad = con.sql("""
        WITH samp AS (
          SELECT doc_id FROM ms_sh
          ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 5),
        ex AS (SELECT doc_id, unnest(sh) AS tok FROM ms_sh),
        sx AS (SELECT doc_id, unnest(sh) AS tok FROM ms_sh
               WHERE doc_id IN (SELECT doc_id FROM samp)),
        cand AS (
          SELECT DISTINCT s.doc_id AS sd, e.doc_id AS od
          FROM sx s JOIN ex e ON e.tok = s.tok AND e.doc_id <> s.doc_id),
        sqlpairs AS (
          SELECT DISTINCT least(c.sd, c.od) AS a, greatest(c.sd, c.od) AS b
          FROM cand c
          JOIN ms_sh x ON x.doc_id = c.sd
          JOIN ms_sh y ON y.doc_id = c.od
          WHERE round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(x.sh, y.sh))), 4) >= 0.5),
        trpairs AS (
          SELECT a, b FROM tr_true
          WHERE a IN (SELECT doc_id FROM samp)
             OR b IN (SELECT doc_id FROM samp))
        SELECT count(*) FROM (
          (SELECT a, b FROM sqlpairs EXCEPT SELECT a, b FROM trpairs)
          UNION ALL
          (SELECT a, b FROM trpairs EXCEPT SELECT a, b FROM sqlpairs))
    """).fetchone()[0]
    if bad:
        raise RuntimeError(
            f"truth-state independent arm: {bad} pair rows differ between "
            f"the bincount core and the pure-SQL sample re-derivation"
        )
    _TR_BUILT[id(con)] = tok


def _fn_cluster_survivors(con):
    _ensure_minhash_state(con)
    return con.sql("""
        SELECT d.doc_id FROM documents d
        LEFT JOIN cc_l cc ON cc.node = d.doc_id AND cc.lbl <> cc.node
        WHERE cc.node IS NULL""")


def _fn_best_survivors(con):
    _ensure_minhash_state(con)
    return con.sql("""
        WITH ranked AS (
          SELECT cc.node,
                 row_number() OVER (PARTITION BY cc.lbl
                                    ORDER BY d.n_chars DESC, cc.node) AS rk
          FROM cc_l cc JOIN documents d ON d.doc_id = cc.node)
        SELECT d.doc_id FROM documents d
        LEFT JOIN (SELECT node FROM ranked WHERE rk > 1) l ON l.node = d.doc_id
        WHERE l.node IS NULL""")


def _fn_dedup_rate_by_source(con):
    _ensure_minhash_state(con)
    return con.sql("""
        WITH surv AS (
          SELECT d.doc_id FROM documents d
          LEFT JOIN cc_l cc ON cc.node = d.doc_id AND cc.lbl <> cc.node
          WHERE cc.node IS NULL)
        SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(s.doc_id) AS BIGINT) AS n_survivors,
               round(1 - count(s.doc_id) / CAST(count(*) AS DOUBLE), 4) AS dedup_rate
        FROM documents d LEFT JOIN surv s ON s.doc_id = d.doc_id
        GROUP BY d.source ORDER BY d.source""")


def _fn_leakage_free_split(con):
    _ensure_minhash_state(con)
    return con.sql("""
        WITH g AS (
          SELECT d.doc_id, coalesce(cc.lbl, d.doc_id) AS group_rep
          FROM documents d LEFT JOIN cc_l cc ON cc.node = d.doc_id),
        b AS (SELECT group_rep,
                     ('0x' || substr(md5(CAST(group_rep AS VARCHAR)), 1, 8))::BIGINT
                       % 10000 AS bucket
              FROM g)
        SELECT CASE WHEN bucket < 9000 THEN 'train'
                    WHEN bucket < 9500 THEN 'val'
                    ELSE 'test' END AS split,
               count(*) AS n_docs,
               count(DISTINCT group_rep) AS n_groups
        FROM b GROUP BY split""")


def _fn_split_leakage_report(con):
    from meteor_spark.queries import _SPLIT_SQL

    _ensure_minhash_state(con)
    return con.sql(f"""
        WITH sp AS ({_SPLIT_SQL})
        SELECT p.a, p.b, sa.split AS split_a, sb.split AS split_b, p.jaccard
        FROM ms_verified p
        JOIN sp sa ON sa.doc_id = p.a
        JOIN sp sb ON sb.doc_id = p.b
        WHERE sa.split <> sb.split
        ORDER BY p.a, p.b""")


def _fn_minhash_eval_report(con):
    _ensure_truth_state(con)
    return con.sql("""
        SELECT CAST((SELECT count(*) FROM tr_true) AS BIGINT) AS n_true,
               CAST((SELECT count(*) FROM ms_verified) AS BIGINT) AS n_detected,
               CAST((SELECT count(*) FROM tr_true t
                     SEMI JOIN ms_verified d ON t.a = d.a AND t.b = d.b) AS BIGINT) AS n_hit,
               round((SELECT count(*) FROM tr_true t
                      SEMI JOIN ms_verified d ON t.a = d.a AND t.b = d.b)
                     / CAST(greatest((SELECT count(*) FROM tr_true), 1) AS DOUBLE), 4) AS recall,
               round((SELECT count(*) FROM tr_true t
                      SEMI JOIN ms_verified d ON t.a = d.a AND t.b = d.b)
                     / CAST(greatest((SELECT count(*) FROM ms_verified), 1) AS DOUBLE), 4) AS precision
        """)


SCALE_ORACLE_FNS["near_dup_cluster_survivors"] = _fn_cluster_survivors
SCALE_ORACLE_FNS["near_dup_best_survivors"] = _fn_best_survivors
SCALE_ORACLE_FNS["dedup_rate_by_source"] = _fn_dedup_rate_by_source
SCALE_ORACLE_FNS["leakage_free_split"] = _fn_leakage_free_split
SCALE_ORACLE_FNS["split_leakage_report"] = _fn_split_leakage_report
SCALE_ORACLE_FNS["minhash_eval_report"] = _fn_minhash_eval_report


def _fn_near_dup_clusters(con):
    _ensure_minhash_state(con)
    return con.sql("SELECT node AS doc_id, lbl AS cluster_id FROM cc_l")


SCALE_ORACLE_FNS["near_dup_clusters"] = _fn_near_dup_clusters


def _fn_semantic_dedup_survivors(con):
    """100x restatement of the SemDeDup survivor oracle: the canonical
    _SEMDEDUP_CTE pair join is quadratic within clusters (~2.5e9
    cosines at 200k vectors / 8 clusters — hours in SQL on either
    engine), so the oracle replays the chain in numpy: plant + seeds +
    nearest-seed assignment + per-cluster PREFIX-MAX survivor rule,
    through the SAME two-zone exact-decision core the Spark operator
    uses (similarity.prefix_max_dropped_mask /
    make_semantic_exact_decider — pinned against the independent
    pair-join form at sf0.001/sf0.01 in tests/test_similarity.py, and
    this gate's canonical SQL oracle still gates sf0.01 and 10x).
    Assignment argmax gets the same two-zone treatment: seed-cosine
    gaps under 1e-9 are re-decided with the sequential fold both
    engines evaluate."""
    import numpy as np

    from meteor_spark.operators.similarity import (
        make_semantic_exact_decider,
        prefix_max_dropped_mask,
    )
    from meteor_spark.queries import _SEMDEDUP_K, _SEMDEDUP_PLANT, _SEMDEDUP_TAU

    base = con.sql(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
        "FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = [int(r[0]) for r in base]
    X = np.asarray([r[1] for r in base], dtype=np.float64)
    plant_rows = [(i + 10_000_000, X[j]) for j, i in enumerate(ids) if i < _SEMDEDUP_PLANT]
    all_ids = np.asarray(ids + [p[0] for p in plant_rows], dtype=np.int64)
    V = np.vstack([X] + [p[1][None, :] for p in plant_rows]) if plant_rows else X
    order = np.argsort(all_ids, kind="stable")
    all_ids, V = all_ids[order], V[order]
    S = V[:_SEMDEDUP_K]  # seeds = K lowest-id vectors

    vn = np.sqrt(np.einsum("ij,ij->i", V, V))
    sn = np.sqrt(np.einsum("ij,ij->i", S, S))
    C = (V @ S.T) / np.outer(vn, sn)
    # argmax by (cos, -cluster): numpy argmax takes the FIRST maximum,
    # which IS the lowest cluster id on exact ties
    assign = C.argmax(axis=1)
    top = np.sort(C, axis=1)
    gap = top[:, -1] - (top[:, -2] if _SEMDEDUP_K > 1 else top[:, -1])
    decider = make_semantic_exact_decider(_SEMDEDUP_TAU, 4)
    import math

    def _seq_cos(x, y):
        d = na = nb = 0.0
        for xi, yi in zip(x.tolist(), y.tolist()):
            d += xi * yi
        for xi in x.tolist():
            na += xi * xi
        for yi in y.tolist():
            nb += yi * yi
        return d / (math.sqrt(na) * math.sqrt(nb))

    for i in np.nonzero(gap < 1e-9)[0]:
        cos = [_seq_cos(V[i], S[k]) for k in range(_SEMDEDUP_K)]
        assign[i] = max(range(_SEMDEDUP_K), key=lambda k: (cos[k], -k))

    boundary = _SEMDEDUP_TAU - 0.5 * 1e-4

    def _indep_recheck(Vc, dropped, k):
        # INDEPENDENT ARM (r10 advice): prefix_max_dropped_mask and the
        # decider are the exact functions the Spark gate runs, so a
        # deterministic sample of this cluster's decisions is re-derived
        # here WITHOUT them: per sampled position p, max cosine against
        # ALL earlier members via plain np.dot, published through an
        # inline HALF_UP shortest-repr round — the documented publish
        # rule — with the 1e-9 boundary zone re-decided by the engines'
        # own sequential fold (_seq_cos). Any keep/drop flip raises.
        from decimal import ROUND_HALF_UP, Decimal

        n = len(Vc)
        if n < 2:
            return
        step = max(1, n // 8)
        tau_d = Decimal(str(_SEMDEDUP_TAU))
        for p in range(1, n, step):
            best = -2.0
            nb = float(np.dot(Vc[p], Vc[p])) ** 0.5
            for jj in range(p):
                c = float(np.dot(Vc[p], Vc[jj])) / (
                    nb * float(np.dot(Vc[jj], Vc[jj])) ** 0.5
                )
                if abs(c - boundary) < 1e-9:
                    c = _seq_cos(Vc[p], Vc[jj])
                best = max(best, c)
            want = Decimal(repr(best)).quantize(
                Decimal(1).scaleb(-4), ROUND_HALF_UP) >= tau_d
            if bool(dropped[p]) != want:
                raise RuntimeError(
                    f"semantic-survivor independent arm: cluster {k} "
                    f"position {p} core={bool(dropped[p])} sample={want}"
                )

    keep_ids, keep_cl = [], []
    for k in range(_SEMDEDUP_K):
        m = np.nonzero(assign == k)[0]  # V is id-sorted, so m is too
        if len(m) == 0:
            continue
        dropped = (
            prefix_max_dropped_mask(V[m], boundary, 1e-9, decider)
            if len(m) > 1
            else np.zeros(1, dtype=bool)
        )
        _indep_recheck(V[m], dropped, k)
        keep_ids.extend(int(x) for x in all_ids[m[~dropped]])
        keep_cl.extend([k] * int((~dropped).sum()))

    import pandas as pd

    out = pd.DataFrame({"vec_id": np.asarray(keep_ids, dtype=np.int64),
                        "cluster": np.asarray(keep_cl, dtype=np.int64)})
    con.register("__sem_surv", out)
    con.execute("DROP TABLE IF EXISTS sem_surv")
    con.execute("CREATE TEMP TABLE sem_surv AS SELECT vec_id, cluster FROM __sem_surv")
    con.unregister("__sem_surv")
    return con.sql("SELECT vec_id, cluster FROM sem_surv")


SCALE_ORACLE_FNS["semantic_dedup_survivors"] = _fn_semantic_dedup_survivors


def _fn_minhash_near_duplicates(con):
    """The headline pair gate itself: once the shared state exists, the
    oracle is just the verified-pair temp table. At 100x this is a
    26.4M-row full-value comparison — the r9 exclusion row inferred
    'hundreds of millions' from an OOM during a doubled-up sweep; the
    measured count made the direct comparison worth attempting."""
    _ensure_minhash_state(con)
    return con.sql("SELECT a, b, jaccard FROM ms_verified")


SCALE_ORACLE_FNS["minhash_near_duplicates"] = _fn_minhash_near_duplicates


def _fn_doc_similarity_topk(con):
    """Scale restatement (r11): the canonical oracle references its
    `verified` CTE twice (sym's UNION ALL), and DuckDB inlines plain
    CTEs, so the whole clone-quadratic band-join pipeline evaluated
    TWICE and spilled >62 GB of temp at 100x. Same staging the other
    minhash-family state uses: materialize the UNTHRESHOLDED verified
    candidates once into a temp table (the topk universe is every
    banded candidate with its jaccard — NOT ms_verified's >= 0.5 cut),
    then symmetrize + rank with the identical canonical tail text."""
    from meteor_spark.queries import (
        _BAND_SQL,
        _HS_SQL,
        _MINHASH_BANDS,
        _SIG_SQL,
        _SIMDOC_K,
    )

    _ensure_minhash_state(con)  # ms_sh
    band_joins = " UNION ALL ".join(
        f"""SELECT a.doc_id AS a, b.doc_id AS b
            FROM ms_tk_bands a JOIN ms_tk_bands b
              ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"""
        for b in range(_MINHASH_BANDS)
    )
    con.execute("DROP TABLE IF EXISTS ms_tk_bands")
    con.execute("DROP TABLE IF EXISTS ms_tk_scored")
    con.execute(f"""
        CREATE TEMP TABLE ms_tk_bands AS
        WITH hs AS (SELECT doc_id, sh, {_HS_SQL} AS hs FROM ms_sh),
        sig AS (SELECT doc_id, sh, [{_SIG_SQL}] AS sig FROM hs)
        SELECT doc_id, {_BAND_SQL} FROM sig""")
    con.execute(f"""
        CREATE TEMP TABLE ms_tk_scored AS
        SELECT p.a, p.b,
               round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
        FROM (SELECT DISTINCT a, b FROM ({band_joins})) p
        JOIN ms_sh x ON x.doc_id = p.a
        JOIN ms_sh y ON y.doc_id = p.b""")
    con.execute("DROP TABLE ms_tk_bands")
    return con.sql(f"""
        WITH sym AS (
          SELECT a AS d, b AS o, jaccard FROM ms_tk_scored
          UNION ALL
          SELECT b AS d, a AS o, jaccard FROM ms_tk_scored),
        ranked AS (
          SELECT d AS doc_id, o AS similar_doc, jaccard,
                 CAST(row_number() OVER (PARTITION BY d ORDER BY jaccard DESC, o)
                      AS INTEGER) AS rnk
          FROM sym)
        SELECT doc_id, similar_doc, jaccard, rnk
        FROM ranked WHERE rnk <= {_SIMDOC_K}""")


SCALE_ORACLE_FNS["doc_similarity_topk"] = _fn_doc_similarity_topk


def _fn_prefix_filter_jaccard_pairs(con):
    """Scale restatement (r11): the posting-join GROUP BY in the r9
    scale SQL materializes the clone-quadratic candidate aggregation
    (4.84B raw matches at 100x). The answer set IS tr_true (all pairs
    with round(jaccard,4) >= 0.5, built pair-free by the blocked
    bincount core and spot-checked by the independent SQL arm), so
    publish it with jaccard recomputed per published pair via the
    canonical list_intersect text — output-linear work."""
    _ensure_truth_state(con)
    return con.sql("""
        SELECT t.a, t.b,
               round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
        FROM tr_true t
        JOIN ms_sh x ON x.doc_id = t.a
        JOIN ms_sh y ON y.doc_id = t.b""")


SCALE_ORACLE_FNS["prefix_filter_jaccard_pairs"] = _fn_prefix_filter_jaccard_pairs


def _fn_doc_containment_pairs(con):
    """Scale restatement (r12 — VERDICT r11 task #2): the r9 scale SQL's
    posting-join GROUP BY materializes the clone-quadratic candidate
    aggregation and spilled >56 GB at 100x (the Spark side COMPLETED);
    the blocked bincount core never materializes candidates. Enumeration
    reuses the SHARED posting state: _posting_pair_counts_block yields
    each unordered intersecting pair once with its exact |A INTERSECT B|
    (lossless for containment — si >= 0.7*la > 0 forces a shared
    shingle); the DIRECTED decision applies the canonical SQL's exact
    double arithmetic (si >= len(a.sh) * 0.7) in each orientation.
    Containment VALUES are not taken from the core: they are recomputed
    per published pair with the canonical list_intersect text —
    output-linear, value-independent of the enumeration. An independent
    pure-SQL arm re-derives a 5-doc sample's complete directed partner
    sets and raises on any divergence (the r10 discipline)."""
    import numpy as np
    import pandas as pd

    from meteor_spark.operators.dedup import _posting_pair_counts_block

    doc_ids, sizes, post_indptr, post_docs, starts, ends, g_sorted = _posting_state(con)
    fa: list = []
    fb: list = []
    ids64 = doc_ids.astype(np.int64)
    for a, bs, cnt in _posting_pair_counts_block(
        range(len(doc_ids)),
        (g_sorted[s:e] for s, e in zip(starts, ends)),
        post_indptr,
        post_docs,
    ):
        si = cnt.astype(np.float64)
        la = float(sizes[a])
        lb = sizes[bs].astype(np.float64)
        fwd = np.nonzero(si >= la * 0.7)[0]  # a's shingles mostly in b
        rev = np.nonzero(si >= lb * 0.7)[0]  # b's shingles mostly in a
        if len(fwd):
            fa.append(np.full(len(fwd), ids64[a], dtype=np.int64))
            fb.append(ids64[bs[fwd]])
        if len(rev):
            fa.append(ids64[bs[rev]])
            fb.append(np.full(len(rev), ids64[a], dtype=np.int64))
    dirp = pd.DataFrame({
        "a": np.concatenate(fa) if fa else np.empty(0, dtype=np.int64),
        "b": np.concatenate(fb) if fb else np.empty(0, dtype=np.int64),
    })
    con.register("__ct_pairs", dirp)
    con.execute("DROP TABLE IF EXISTS ct_pairs")
    con.execute("CREATE TEMP TABLE ct_pairs AS SELECT a, b FROM __ct_pairs")
    con.unregister("__ct_pairs")
    bad = con.sql("""
        WITH samp AS (
          SELECT doc_id FROM ms_sh
          ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 5),
        ex AS (SELECT doc_id, unnest(sh) AS tok FROM ms_sh),
        sx AS (SELECT doc_id, unnest(sh) AS tok FROM ms_sh
               WHERE doc_id IN (SELECT doc_id FROM samp)),
        cand AS (
          SELECT DISTINCT s.doc_id AS sd, e.doc_id AS od
          FROM sx s JOIN ex e ON e.tok = s.tok AND e.doc_id <> s.doc_id),
        sqlpairs AS (
          SELECT c.sd AS a, c.od AS b
          FROM cand c
          JOIN ms_sh x ON x.doc_id = c.sd JOIN ms_sh y ON y.doc_id = c.od
          WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) >= len(x.sh) * 0.7
          UNION
          SELECT c.od AS a, c.sd AS b
          FROM cand c
          JOIN ms_sh x ON x.doc_id = c.od JOIN ms_sh y ON y.doc_id = c.sd
          WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) >= len(x.sh) * 0.7),
        ctp AS (
          SELECT a, b FROM ct_pairs
          WHERE a IN (SELECT doc_id FROM samp)
             OR b IN (SELECT doc_id FROM samp))
        SELECT count(*) FROM (
          (SELECT a, b FROM sqlpairs EXCEPT SELECT a, b FROM ctp)
          UNION ALL
          (SELECT a, b FROM ctp EXCEPT SELECT a, b FROM sqlpairs))
    """).fetchone()[0]
    if bad:
        raise RuntimeError(
            f"containment independent arm: {bad} directed pair rows differ "
            f"between the bincount core and the pure-SQL sample re-derivation"
        )
    return con.sql("""
        SELECT t.a, t.b,
               round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) / len(x.sh), 4)
                 AS containment
        FROM ct_pairs t
        JOIN ms_sh x ON x.doc_id = t.a
        JOIN ms_sh y ON y.doc_id = t.b""")


SCALE_ORACLE_FNS["doc_containment_pairs"] = _fn_doc_containment_pairs


_NG_BUILT: dict[int, tuple] = {}


def _ng_posting_state(con):
    """Posting arrays for ngram_jaccard_pairs: 2-gram shingles with the
    (lang, source) block key FOLDED INTO THE GRAM ID (tok ->
    lang\\x01source\\x01tok) — a cross-block pair then shares zero gram
    ids, so the global enumeration IS the blocked join. ng_sh keeps the
    PLAIN shingle lists for the output-linear value recomputation."""
    from meteor_spark.queries import _NORM_SQL, _shingle_sql

    tok = _fixture_token(con)
    hit = _NG_BUILT.get(id(con))
    if hit and hit[0] == tok:
        return hit[1]
    con.execute("DROP TABLE IF EXISTS ng_sh")
    con.execute(f"""
        CREATE TEMP TABLE ng_sh AS
        WITH nd AS (
          SELECT doc_id, lang, source,
                 regexp_split_to_array({_NORM_SQL}, ' ') AS nws
          FROM documents)
        SELECT doc_id, lang, source, {_shingle_sql(2)} AS sh FROM nd""")
    state = _build_posting_arrays(
        con,
        """
        WITH ex AS (
          SELECT doc_id,
                 lang || chr(1) || source || chr(1) || unnest(sh) AS tok
          FROM ng_sh),
        d AS (SELECT tok, row_number() OVER (ORDER BY tok) - 1 AS gid
              FROM (SELECT DISTINCT tok FROM ex))
        SELECT e.doc_id, d.gid FROM ex e JOIN d USING (tok)
        """,
        "SELECT doc_id, len(sh) AS sz FROM ng_sh ORDER BY doc_id",
    )
    _NG_BUILT[id(con)] = (tok, state)
    return state


def _fn_ngram_jaccard_pairs(con):
    """Scale restatement (r12 — VERDICT r11 task #3): the canonical
    all-pairs list_intersect within (lang, source) blocks is the
    quadratic truth (983s at 10x); this posting-bincount form does
    Sum_gram df(gram)^2 work with zero candidate materialization. The
    DIRECTED decision is the canonical filter's exact double arithmetic
    (UNROUNDED si/(la+lb-si) >= 0.05 — note the canonical ngram filter,
    unlike prefix_filter's, does not round before comparing). Values
    are recomputed per published pair with the canonical list_intersect
    text; a pure-SQL 5-doc sample arm re-derives complete partner sets
    within blocks and raises on divergence."""
    import numpy as np
    import pandas as pd

    from meteor_spark.operators.dedup import _posting_pair_counts_block

    doc_ids, sizes, post_indptr, post_docs, starts, ends, g_sorted = _ng_posting_state(con)
    fa: list = []
    fb: list = []
    ids64 = doc_ids.astype(np.int64)
    for a, bs, cnt in _posting_pair_counts_block(
        range(len(doc_ids)),
        (g_sorted[s:e] for s, e in zip(starts, ends)),
        post_indptr,
        post_docs,
    ):
        si = cnt.astype(np.float64)
        la = float(sizes[a])
        lb = sizes[bs].astype(np.float64)
        keep = np.nonzero(si / (la + lb - si) >= 0.05)[0]
        if len(keep):
            fa.append(np.full(len(keep), ids64[a], dtype=np.int64))
            fb.append(ids64[bs[keep]])
    pairs = pd.DataFrame({
        "a": np.concatenate(fa) if fa else np.empty(0, dtype=np.int64),
        "b": np.concatenate(fb) if fb else np.empty(0, dtype=np.int64),
    })
    con.register("__ng_pairs", pairs)
    con.execute("DROP TABLE IF EXISTS ng_pairs")
    con.execute("CREATE TEMP TABLE ng_pairs AS SELECT a, b FROM __ng_pairs")
    con.unregister("__ng_pairs")
    bad = con.sql("""
        WITH samp AS (
          SELECT doc_id FROM ng_sh
          ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 5),
        sqlpairs AS (
          SELECT least(a.doc_id, b.doc_id) AS a,
                 greatest(a.doc_id, b.doc_id) AS b
          FROM ng_sh a JOIN ng_sh b
            ON a.lang = b.lang AND a.source = b.source
           AND a.doc_id <> b.doc_id
          WHERE a.doc_id IN (SELECT doc_id FROM samp)
            AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.05),
        ngp AS (
          SELECT a, b FROM ng_pairs
          WHERE a IN (SELECT doc_id FROM samp)
             OR b IN (SELECT doc_id FROM samp))
        SELECT count(*) FROM (
          (SELECT DISTINCT a, b FROM sqlpairs EXCEPT SELECT a, b FROM ngp)
          UNION ALL
          (SELECT a, b FROM ngp EXCEPT SELECT DISTINCT a, b FROM sqlpairs))
    """).fetchone()[0]
    if bad:
        raise RuntimeError(
            f"ngram independent arm: {bad} pair rows differ between the "
            f"bincount core and the pure-SQL sample re-derivation"
        )
    return con.sql("""
        SELECT t.a, t.b,
               round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.sh, y.sh))), 4) AS jaccard
        FROM ng_pairs t
        JOIN ng_sh x ON x.doc_id = t.a
        JOIN ng_sh y ON y.doc_id = t.b""")


SCALE_ORACLE_FNS["ngram_jaccard_pairs"] = _fn_ngram_jaccard_pairs


def _fn_simhash_hamming_pairs(con):
    """Staged restatement (r12 — the doc_similarity_topk treatment):
    the string form's cand CTE references sh twice per pigeonhole arm
    plus twice in the final join, and DuckDB inlines plain CTEs, so the
    word->bit simhash pipeline (doc x word x 32 bit-positions rows)
    evaluated ~6x and spilled >51 GB at 100x. Stage the per-doc simhash
    ONCE into a temp table, then push the hamming filter INSIDE each
    pigeonhole arm so only ANSWER rows ever reach the distinct UNION
    (filter commutes with union/distinct — identical result set to the
    canonical filter-after-union form)."""
    tok = _fixture_token(con)
    if getattr(_fn_simhash_hamming_pairs, "_built", None) != (id(con), tok):
        con.execute("DROP TABLE IF EXISTS simh")
        con.execute(f"CREATE TEMP TABLE simh AS WITH {_SIMHASH_CTES} SELECT doc_id, simhash FROM sh")
        _fn_simhash_hamming_pairs._built = (id(con), tok)
    return con.sql("""
        WITH cand AS (
          SELECT a.doc_id AS a, b.doc_id AS b,
                 bit_count(xor(a.simhash, b.simhash)) AS hd
          FROM simh a JOIN simh b
            ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
          UNION
          SELECT a.doc_id AS a, b.doc_id AS b,
                 bit_count(xor(a.simhash, b.simhash)) AS hd
          FROM simh a JOIN simh b
            ON (a.simhash & 65535) = (b.simhash & 65535) AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 1)
        SELECT a, b, CAST(hd AS INTEGER) AS hamming FROM cand""")


SCALE_ORACLE_FNS["simhash_hamming_pairs"] = _fn_simhash_hamming_pairs


def _fn_image_ahash_pairs(con):
    """Staged restatement (r12): same treatment as simhash — the aHash
    tile pipeline (doc x 32 tiles x 4-char means) materializes once,
    and the hamming<=2 filter moves inside each of the three pigeonhole
    arms so the distinct UNION only ever sees answer rows."""
    tok = _fixture_token(con)
    if getattr(_fn_image_ahash_pairs, "_built", None) != (id(con), tok):
        con.execute("DROP TABLE IF EXISTS imgh")
        con.execute("""
            CREATE TEMP TABLE imgh AS
            WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) >= 128),
            tiles AS (SELECT doc_id, unnest(range(0, 32)) AS t, text FROM d),
            tm AS (
              SELECT doc_id, t,
                     list_avg(list_transform(range(1, 5),
                       i -> CAST(ascii(substr(text, CAST(t * 4 + i AS INT), 1)) AS DOUBLE))) AS m
              FROM tiles),
            gm AS (SELECT doc_id, avg(m) AS g FROM tm GROUP BY doc_id),
            ah0 AS (
              SELECT tm.doc_id,
                     CAST(sum(CASE WHEN tm.m > gm.g THEN 1 << t ELSE 0 END) AS BIGINT) AS ahash
              FROM tm JOIN gm USING (doc_id) GROUP BY tm.doc_id)
            SELECT * FROM ah0
            WHERE bit_count(ahash) > 0 AND bit_count(ahash) < 32""")
        _fn_image_ahash_pairs._built = (id(con), tok)
    return con.sql("""
        WITH cand AS (
          SELECT a.doc_id AS a, b.doc_id AS b,
                 bit_count(xor(a.ahash, b.ahash)) AS hd
          FROM imgh a JOIN imgh b
            ON (a.ahash & 2047) = (b.ahash & 2047) AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
          UNION
          SELECT a.doc_id AS a, b.doc_id AS b,
                 bit_count(xor(a.ahash, b.ahash)) AS hd
          FROM imgh a JOIN imgh b
            ON ((a.ahash >> 11) & 2047) = ((b.ahash >> 11) & 2047) AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 2
          UNION
          SELECT a.doc_id AS a, b.doc_id AS b,
                 bit_count(xor(a.ahash, b.ahash)) AS hd
          FROM imgh a JOIN imgh b
            ON ((a.ahash >> 22) & 1023) = ((b.ahash >> 22) & 1023) AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.ahash, b.ahash)) <= 2)
        SELECT a, b, CAST(hd AS INTEGER) AS hamming FROM cand
        ORDER BY a, b""")


SCALE_ORACLE_FNS["image_ahash_pairs"] = _fn_image_ahash_pairs
