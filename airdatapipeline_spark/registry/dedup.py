"""Deduplication family: exact, MinHash/SimHash LSH, n-gram Jaccard,
embedding-cosine, substring/paragraph tiers, connected components,
semantic/fingerprint decisions."""

from __future__ import annotations

from pyspark.sql import functions as F
from ..model import TODAY, URL_PREFIX, with_model_ctes
from ..operators import dedup
from ..operators import similarity
from ..operators import text
from .core import register
from ._shared import _BAND_SELECTS, _EMB_CTE, _IVF_ASSIGN_SQL, _MINHASH_AGGS, _SHINGLES_CTE, _SQL_LIST, _TOKS



@register(
    "dedup_exact_groups",
    with_model_ctes(
        """
        SELECT md5(title) AS text_hash, COUNT(*) AS n_copies, MIN(doc_id) AS keeper_id
        FROM bronze GROUP BY 1 HAVING COUNT(*) > 1
        """,
        bronze=True,
    ),
)
def dd_exact(spark, sf_dir):
    return dedup.exact_dup_groups(spark, sf_dir)


@register(
    "dedup_ngram_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE.format(src="(SELECT * FROM documents WHERE doc_id % 20 = 0)")},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, n_inter / (sa.n + sb.n - n_inter) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    ORDER BY jaccard DESC, id_a, id_b LIMIT 20
    """,
)
def dd_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(spark, sf_dir)


@register(
    "dedup_minhash_lsh_candidates",
    f"""
    WITH {_SHINGLES_CTE.format(src="documents")},
    hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(shingle), 1, 14)) AS BIGINT) % 1073741824 AS h
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY 1),
    bands AS (
      {_BAND_SELECTS}
    )
    SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.bx = y.bx AND x.by = y.by AND x.doc_id < y.doc_id
    """,
)
def dd_minhash(spark, sf_dir):
    return dedup.minhash_lsh_candidates(spark, sf_dir)


_SIMHASH_BITSUMS = ", ".join(
    f"SUM((h >> {b}) & 1) AS b{b}" for b in range(dedup.SIMHASH_BITS)
)
_SIMHASH_VALUE = " + ".join(
    f"CAST(CASE WHEN b{b} * 2 > n_tok THEN 1 ELSE 0 END AS BIGINT) * CAST({2**b} AS BIGINT)"
    for b in range(dedup.SIMHASH_BITS)
)


@register(
    "dedup_simhash_pairs",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    hashed AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok),
    perbit AS (SELECT doc_id, COUNT(*) AS n_tok, {_SIMHASH_BITSUMS} FROM hashed GROUP BY 1),
    sig AS (SELECT doc_id, {_SIMHASH_VALUE} AS simhash FROM perbit WHERE doc_id % 20 = 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    """,
)
def dd_simhash(spark, sf_dir):
    return dedup.simhash_near_pairs(spark, sf_dir)


@register(
    "dedup_embedding_cosine_pairs",
    f"""
    WITH {_EMB_CTE}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_dot_product(a.emb, b.emb) / (a.norm * b.norm) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 = 0
    ORDER BY cosine DESC, id_a, id_b LIMIT 20
    """,
)
def dd_embcos(spark, sf_dir):
    return dedup.embedding_near_dup_pairs(spark, sf_dir)


@register(
    "dedup_simhash_lsh_candidates",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents),
    hashed AS (SELECT doc_id, CAST(concat('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok),
    perbit AS (SELECT doc_id, COUNT(*) AS n_tok, {_SIMHASH_BITSUMS} FROM hashed GROUP BY 1),
    sig AS (SELECT doc_id, {_SIMHASH_VALUE} AS simhash FROM perbit),
    bands AS (
      SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS bv
      FROM sig, (SELECT unnest([0,1,2,3]) AS band)
    )
    SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
           CAST(bit_count(xor(x.simhash, y.simhash)) AS INTEGER) AS hamming
    FROM bands x JOIN bands y
      ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id
    WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
    """,
)
def dd_simhash_lsh(spark, sf_dir):
    return dedup.simhash_lsh_candidates(spark, sf_dir)


@register(
    "dedup_cluster_assignments",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE.format(src="documents")},
    hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(shingle), 1, 14)) AS BIGINT) % 1073741824 AS h
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY 1),
    bands AS (
      {_BAND_SELECTS}
    ),
    pairs AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bx = y.bx AND x.by = y.by AND x.doc_id < y.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(src, node) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY 1
    """,
)
def dd_clusters(spark, sf_dir):
    return dedup.cluster_assignments(spark, sf_dir)


@register(
    "dedup_incremental_candidates",
    f"""
    WITH {_SHINGLES_CTE.format(src="documents")},
    hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(shingle), 1, 14)) AS BIGINT) % 1073741824 AS h
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY 1),
    bands AS (
      {_BAND_SELECTS}
    )
    SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS dup_of
    FROM bands n JOIN bands c
      ON n.band = c.band AND n.bx = c.bx AND n.by = c.by
    WHERE n.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
    """,
)
def dd_incremental(spark, sf_dir):
    return dedup.incremental_minhash_candidates(spark, sf_dir)


_CC_STAR_ORACLE = f"""
    WITH RECURSIVE {_SHINGLES_CTE.format(src="documents")},
    hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(shingle), 1, 14)) AS BIGINT) % 1073741824 AS h
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY 1),
    bands AS (
      {_BAND_SELECTS}
    ),
    pairs AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bx = y.bx AND x.by = y.by AND x.doc_id < y.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b, id_a FROM pairs
    ),
    reach(src, node) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY 1
"""


@register("dedup_cluster_assignments_star", _CC_STAR_ORACLE)
def dd_clusters_star(spark, sf_dir):
    """Large-star/small-star connected components (O(log n) rounds) — same
    fixpoint as the HashMin loop, same recursive-CTE oracle."""
    return dedup.cluster_assignments_star(spark, sf_dir)


@register(
    "dedup_substring_clusters",
    f"""
    WITH RECURSIVE w AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, (length(text) - 40) // 10 + 2),
                    i -> md5(substr(text, (i - 1) * 10 + 1, 40)))) AS h
      FROM documents WHERE length(text) >= 40
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach(src, node) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.node = e.src
    )
    SELECT src AS doc_id, MIN(node) AS cluster_id FROM reach GROUP BY 1
    """,
)
def dd_substring_clusters(spark, sf_dir):
    """Exact-substring pair graph contracted to dedup decisions via the
    large/small-star components — the pairs→clusters composition applied
    to the char-level tier (same shape as dedup_cluster_assignments over
    the MinHash graph)."""
    pairs = dedup.exact_substring_pairs(spark, sf_dir)
    edges = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    labels = dedup.star_components(edges)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


@register(
    "dedup_exact_substring_pairs",
    """
    WITH w AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, (length(text) - 40) // 10 + 2),
                    i -> md5(substr(text, (i - 1) * 10 + 1, 40)))) AS h
      FROM documents WHERE length(text) >= 40
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared_windows
    FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def dd_exact_substring(spark, sf_dir):
    """Char-level exact-substring dedup tier (strided 40-char window hash)."""
    return dedup.exact_substring_pairs(spark, sf_dir)


@register(
    "dedup_semantic_decisions",
    f"""
    WITH {_EMB_CTE},
    cent AS (
      SELECT vec_id AS centroid_id, emb, norm FROM e
      WHERE vec_id >= {similarity.CENTROID_ID_LO}
        AND vec_id < {similarity.CENTROID_ID_LO + similarity.N_CENTROIDS}
    ),
    assigned AS ({_IVF_ASSIGN_SQL.format(src="e", n=1)}),
    pruned AS (
      SELECT DISTINCT a.vec_id
      FROM assigned a JOIN assigned b
        ON a.centroid_id = b.centroid_id AND b.vec_id < a.vec_id
       AND list_dot_product(a.emb, b.emb) / (a.norm * b.norm) >= {dedup.SEMANTIC_THRESHOLD}
    )
    SELECT a.vec_id, a.centroid_id, p.vec_id IS NULL AS is_kept
    FROM assigned a LEFT JOIN pruned p ON a.vec_id = p.vec_id
    """,
)
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style cluster-bucketed semantic dedup: IVF centroid
    assignment → within-cluster cosine pairs → min-id-wins decisions."""
    return dedup.semantic_dedup_decisions(spark, sf_dir)


@register(
    "dedup_fingerprint_quality_decisions",
    f"""
    WITH feat AS (
      SELECT doc_id,
             md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fingerprint,
             len(t) AS word_count, length(text) AS char_count,
             len(list_filter(t, x -> list_contains({_SQL_LIST(text.LANG_STOPWORDS['en'])}, x)))
               AS stop_hits
      FROM (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    ),
    scored AS (
      SELECT doc_id, fingerprint,
             least(word_count / 100.0, 1.0) * 0.4 + (stop_hits / word_count) * 0.4
               + least((char_count / word_count) / 8.0, 1.0) * 0.2 AS quality_score
      FROM feat
    )
    SELECT doc_id, fingerprint, quality_score,
           row_number() OVER (
             PARTITION BY fingerprint ORDER BY quality_score DESC, doc_id
           ) = 1 AS is_kept
    FROM scored
    """,
)
def q_fingerprint_quality(spark, sf_dir):
    """Quality-priority dedup decisions: keep the highest-quality doc per
    content-fingerprint cluster (not min-id) — every doc gets a verdict."""
    return dedup.fingerprint_quality_decisions(spark, sf_dir)


@register(
    "dedup_candidate_triangles",
    f"""
    WITH {_SHINGLES_CTE.format(src="documents")},
    hashed AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(shingle), 1, 14)) AS BIGINT) % 1073741824 AS h
      FROM sh
    ),
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY 1),
    bands AS (
      {_BAND_SELECTS}
    ),
    edges AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bx = y.bx AND x.by = y.by AND x.doc_id < y.doc_id
    ),
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e2.a = e1.b
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
      SELECT a AS doc_id FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    ) GROUP BY 1
    """,
)
def q_candidate_triangles(spark, sf_dir):
    """Triangle counts over the LSH candidate graph (clique-vs-chain audit
    for dedup clusters); each triangle enumerated once via low→high edge
    orientation + closing-edge join."""
    return dedup.candidate_triangle_counts(spark, sf_dir)


@register(
    "dedup_prefix_jaccard_pairs",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_distinct({_TOKS})) AS tok FROM documents
    ),
    dfc AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY 1),
    ranked AS (
      SELECT t.doc_id, t.tok,
             row_number() OVER (PARTITION BY t.doc_id ORDER BY dfc.df, t.tok) AS r
      FROM tok t JOIN dfc USING (tok)
    ),
    sizes AS (SELECT doc_id, MAX(r) AS n FROM ranked GROUP BY 1),
    pre AS (
      SELECT r.doc_id, r.tok
      FROM ranked r JOIN sizes s USING (doc_id)
      WHERE r.r <= s.n
                   - CAST(-floor((-{dedup.JACCARD_NUM} * s.n) / {dedup.JACCARD_DEN}) AS BIGINT)
                   + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM pre a JOIN pre b ON a.tok = b.tok AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS inter
      FROM cand c
      JOIN tok ta ON ta.doc_id = c.id_a
      JOIN tok tb ON tb.doc_id = c.id_b AND tb.tok = ta.tok
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b, i.inter,
           sa.n + sb.n - i.inter AS union_n,
           i.inter / (sa.n + sb.n - i.inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE {dedup.JACCARD_DEN} * i.inter >= {dedup.JACCARD_NUM} * (sa.n + sb.n - i.inter)
    """,
)
def q_prefix_jaccard(spark, sf_dir):
    """Exact-threshold set-similarity self-join via PREFIX FILTERING
    (AllPairs/PPJoin): candidates only from each doc's rarest-token
    prefix, exact integer cross-multiplied verification — guaranteed
    complete at Jaccard ≥ 0.95, no LSH recall loss."""
    return dedup.prefix_jaccard_pairs(spark, sf_dir)


# ---------------------------------------------------------------------------
# Paragraph-level dedup (round 3: Dolma/CCNet-style segment dedup — drop
# every repeated segment corpus-wide, reassemble documents from survivors)
# ---------------------------------------------------------------------------


@register(
    "dedup_paragraph_rebuild",
    """
    WITH idx AS (
      SELECT doc_id, text,
             unnest(range(0, CAST(ceil(len(string_split(text, ' ')) / 20.0) AS BIGINT)))
               AS para_idx
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, para_idx,
             array_to_string(
               list_slice(string_split(text, ' '), para_idx * 20 + 1, para_idx * 20 + 20),
               ' ') AS para
      FROM idx
    ),
    kept AS (
      SELECT doc_id, para_idx, para FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(para) ORDER BY doc_id, para_idx) AS occ
        FROM hashed
      ) WHERE occ = 1
    ),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             md5(string_agg(md5(para), '' ORDER BY para_idx)) AS dedup_fingerprint
      FROM kept GROUP BY 1
    ),
    totals AS (SELECT doc_id, COUNT(*) AS n_paras FROM hashed GROUP BY 1)
    SELECT t.doc_id, t.n_paras,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) / t.n_paras AS kept_frac,
           COALESCE(r.dedup_fingerprint, md5('')) AS dedup_fingerprint
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
)
def dedup_paragraph(spark, sf_dir):
    return dedup.paragraph_dedup(spark, sf_dir)


_FD_BANDS = "\n      UNION ALL ".join(
    f"SELECT doc_id, {j} AS band, h{j} AS bx FROM sig"
    for j in range(dedup.N_MINHASH)
)

_FD_JAC = (
    "CAST(COALESCE(i.n_shared, 0) AS DOUBLE)"
    " / (st.n + se.n - COALESCE(i.n_shared, 0))"
)


@register(
    "dedup_fuzzy_decontamination",
    f"""
    WITH {_SHINGLES_CTE.format(src="documents")},
    hashed AS (SELECT doc_id,
                      CAST(concat('0x', substr(md5(shingle), 1, 14)) AS BIGINT)
                        % 1073741824 AS h
               FROM sh),
    sig AS (SELECT doc_id, {_MINHASH_AGGS} FROM hashed GROUP BY 1),
    bands AS ({_FD_BANDS}),
    cand AS (SELECT DISTINCT t.doc_id, e.doc_id AS eval_id
             FROM bands t JOIN bands e ON t.band = e.band AND t.bx = e.bx
             WHERE t.doc_id % {dedup.FUZZY_DECON_EVAL_MOD} <> 0
               AND e.doc_id % {dedup.FUZZY_DECON_EVAL_MOD} = 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (SELECT c.doc_id, c.eval_id, COUNT(*) AS n_shared
              FROM cand c
              JOIN sh a ON a.doc_id = c.doc_id
              JOIN sh b ON b.doc_id = c.eval_id AND b.shingle = a.shingle
              GROUP BY 1, 2)
    SELECT c.doc_id, c.eval_id,
           st.n AS n_train_shingles, se.n AS n_eval_shingles,
           CAST(COALESCE(i.n_shared, 0) AS BIGINT) AS n_shared,
           {_FD_JAC} AS jaccard,
           {_FD_JAC} >= {dedup.FUZZY_DECON_JACCARD_MIN!r} AS flagged
    FROM cand c
    JOIN sizes st ON st.doc_id = c.doc_id
    JOIN sizes se ON se.doc_id = c.eval_id
    LEFT JOIN inter i ON i.doc_id = c.doc_id AND i.eval_id = c.eval_id
    ORDER BY c.doc_id, c.eval_id
    """,
)
def dedup_fuzzy_decon(spark, sf_dir):
    """Fuzzy benchmark decontamination: minhash banding at r=1 (the
    high-recall banding corner — right for contamination, where a missed
    leak poisons an eval and a false candidate costs one join row)
    proposes train×eval near-dup candidates; ONLY candidates are verified
    with the exact shingle Jaccard. Completes the decontamination arc:
    exact df-capped grams → runtime-Bloom big-big → NEAR-duplicate
    (dedup.fuzzy_decontamination docstring)."""
    return dedup.fuzzy_decontamination(spark, sf_dir)
