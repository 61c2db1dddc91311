"""Shared DuckDB oracle CTE fragments for the MinHash-LSH family.

Used by ``queries/llm.py`` (pairs / clusters / fuzzy rescore) and
``queries/curation.py`` (star-contraction clusters). Import-safe from
any registry module: nothing here registers queries.
"""

from __future__ import annotations

from cdc_system_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

#: md5-hex → signed-int64 (60 bits) mod P — the oracle twin of
#: functions.portable.md5_i64 composed with the MinHash modulus.
HS = f"(CAST(CONCAT('0x', SUBSTR(MD5(s), 1, 15)) AS BIGINT) % {MINHASH_P})"

#: char-7 shingles of ``text`` (LSH uses 7; char-5 collides on small vocab)
SH7 = (
    "unnest(list_transform(range(1, greatest(length(text) - 6, 1) + 1), "
    "i -> substr(text, i, 7)))"
)


def perm_sql(i: int) -> str:
    """One universal-hash MinHash permutation as a grouped MIN."""
    return f"MIN((hmod * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}) AS h{i}"


PERMS16 = ", ".join(perm_sql(i) for i in range(16))

def bands_sql(sig: str = "sig") -> str:
    """Band-key SELECT over a signature CTE: pairs of minhashes packed
    into int64 (h < 2^31, so h*2^31 + h' is exact and collision-free) —
    mirrors lsh_candidate_pairs."""
    return "\n        UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"h{4*b} * 2147483648 + h{4*b+1} AS k0, "
        f"h{4*b+2} * 2147483648 + h{4*b+3} AS k1 FROM {sig}"
        for b in range(4)
    )


BANDS7 = bands_sql()


def sig_band_ctes(source: str, sfx: str) -> str:
    """Per-source signature + band CTE chain with suffixed names
    (``sh_a → hm_a → sig_a → bands_a``) — the two-source form used by
    the batch-vs-corpus ingest oracles."""
    return f"""sh{sfx} AS (SELECT doc_id, {SH7} AS s FROM {source}),
    hm{sfx} AS (SELECT doc_id, {HS} AS hmod FROM sh{sfx}),
    sig{sfx} AS (
        SELECT doc_id, {PERMS16}
        FROM hm{sfx} GROUP BY doc_id),
    bands{sfx} AS (
        {bands_sql(f"sig{sfx}")})"""


def lsh_ctes(source: str = "documents") -> str:
    """CTE chain ``sh → hm → sig → bands → lsh_pairs`` over ``source``."""
    return f"""sh AS (SELECT doc_id, {SH7} AS s FROM {source}),
    hm AS (SELECT doc_id, {HS} AS hmod FROM sh),
    sig AS (
        SELECT doc_id, {PERMS16}
        FROM hm GROUP BY doc_id),
    bands AS (
        {BANDS7}),
    lsh_pairs AS (
        SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
        FROM bands a JOIN bands b
          ON a.band_idx = b.band_idx AND a.k0 = b.k0 AND a.k1 = b.k1
             AND a.doc_id < b.doc_id)"""


def cluster_ctes(source: str = "documents") -> str:
    """``lsh_ctes`` + transitive closure (``edges → reach → comp``);
    embed under ``WITH RECURSIVE``."""
    return f"""{lsh_ctes(source)},
    edges AS (SELECT id1 AS a, id2 AS b FROM lsh_pairs
              UNION SELECT id2, id1 FROM lsh_pairs),
    reach(src, dst) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    comp AS (SELECT src, LEAST(src, MIN(dst)) AS cluster_id
             FROM reach GROUP BY src)"""
