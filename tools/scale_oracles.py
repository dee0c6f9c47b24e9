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

SCALE_ORACLES["simhash_hamming_pairs"] = f"""
    WITH {_SIMHASH_CTES},
    cand AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM sh a JOIN sh b
        ON (a.simhash >> 16) = (b.simhash >> 16) AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM sh a JOIN sh b
        ON (a.simhash & 65535) = (b.simhash & 65535) AND a.doc_id < b.doc_id)
    SELECT c.a, c.b,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
    FROM cand c JOIN sh x ON x.doc_id = c.a JOIN sh y ON y.doc_id = c.b
    WHERE bit_count(xor(x.simhash, y.simhash)) <= 1
"""

SCALE_ORACLES["image_ahash_pairs"] = """
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
      FROM tm JOIN gm USING (doc_id) GROUP BY tm.doc_id),
    ah AS (SELECT * FROM ah0
           WHERE bit_count(ahash) > 0 AND bit_count(ahash) < 32),
    cand AS (
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM ah a JOIN ah b
        ON (a.ahash & 2047) = (b.ahash & 2047) AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM ah a JOIN ah b
        ON ((a.ahash >> 11) & 2047) = ((b.ahash >> 11) & 2047) AND a.doc_id < b.doc_id
      UNION
      SELECT a.doc_id AS a, b.doc_id AS b
      FROM ah a JOIN ah b
        ON ((a.ahash >> 22) & 1023) = ((b.ahash >> 22) & 1023) AND a.doc_id < b.doc_id)
    SELECT c.a, c.b,
           CAST(bit_count(xor(x.ahash, y.ahash)) AS INTEGER) AS hamming
    FROM cand c JOIN ah x ON x.doc_id = c.a JOIN ah y ON y.doc_id = c.b
    WHERE bit_count(xor(x.ahash, y.ahash)) <= 2
    ORDER BY a, b
"""


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
