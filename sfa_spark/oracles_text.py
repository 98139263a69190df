"""DuckDB oracles for the LLM-pipeline queries (queries_text.py).

Portability notes:
  * tokenization: regexp_split_to_array(trim(lower(text)), '\\s+')
    ≡ Spark split(trim(lower(text)), '\\s+').
  * md5() is identical in both engines → all hashing (minhash bands,
    fingerprints, simhash bit source) is engine-stable by construction.
  * hex→int: ('0x' || substr(md5(x),1,8))::BIGINT ≡ Spark
    conv(substring(md5(x),1,8),16,10).
"""

from __future__ import annotations

ORACLES: dict[str, str] = {}

_TOKS = "regexp_split_to_array(trim(lower(text)), '\\s+')"

_SHINGLES = f"""toks AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         tk[j] || ' ' || tk[j+1] || ' ' || tk[j+2] AS shingle
  FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS j
    FROM toks
  )
)"""

ORACLES["q_token_stats"] = f"""WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       round(length(text) * 1.0 / len(tk) + 1e-9, 4) + 0.0 AS avg_tok_len,
       round(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) * 1.0 / length(text) + 1e-9, 4) + 0.0 AS punct_ratio,
       round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) + 1e-9, 4) + 0.0 AS digit_ratio,
       round(len(list_filter(tk, x -> x IN ('the','a','and','of','to'))) * 1.0 / len(tk) + 1e-9, 4) + 0.0 AS stopword_ratio
FROM t"""

ORACLES["q_quality"] = f"""WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM documents
),
s AS (
  SELECT doc_id,
         length(text) * 1.0 / len(tk) AS avg_tok_len,
         length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digit_ratio,
         len(list_filter(tk, x -> x IN ('the','a','and','of','to'))) * 1.0 / len(tk) AS stopword_ratio
  FROM t
)
SELECT doc_id,
       round(greatest(0.0,
         1.0 - least(1.0, abs(avg_tok_len - 5.0) / 10.0) * 0.4
             - least(1.0, digit_ratio * 5.0) * 0.3
             - CASE WHEN stopword_ratio <= 0.0 THEN 0.3 ELSE 0.0 END) + 1e-9, 4) + 0.0 AS quality
FROM s"""

ORACLES["q_lang_id"] = f"""WITH sw(lang_cand, tok) AS (
  VALUES ('en','the'),('en','a'),('en','and'),('en','of'),('en','to'),
         ('de','der'),('de','die'),('de','das'),('de','und'),('de','ist'),
         ('fr','le'),('fr','la'),('fr','et'),('fr','les'),('fr','des'),
         ('es','el'),('es','la'),('es','y'),('es','de'),('es','los')
),
tok AS (
  SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
),
hits AS (
  SELECT t.doc_id, s.lang_cand, count(*) AS hits
  FROM tok t JOIN sw s USING (tok)
  GROUP BY t.doc_id, s.lang_cand
),
best AS (
  SELECT doc_id, lang_cand AS pred_lang, hits
  FROM hits
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang_cand ASC) = 1
)
SELECT d.doc_id,
       coalesce(b.pred_lang, 'und') AS pred_lang,
       CAST(coalesce(b.hits, 0) AS BIGINT) AS hits
FROM documents d LEFT JOIN best b USING (doc_id)"""

ORACLES["q_fingerprint"] = f"""WITH {_SHINGLES},
h AS (
  SELECT doc_id, md5(shingle) AS h FROM shingles
),
topn AS (
  SELECT doc_id, h FROM h
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h) <= 4
)
SELECT doc_id, md5(string_agg(h, '' ORDER BY h)) AS fingerprint
FROM topn GROUP BY doc_id"""

ORACLES["q_dedup_exact"] = """SELECT md5(text) AS text_hash,
       min(doc_id) AS keeper_doc_id,
       CAST(count(*) AS BIGINT) AS dup_cnt
FROM documents GROUP BY md5(text)"""

ORACLES["q_jaccard_topk"] = f"""WITH {_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.inter AS BIGINT) AS inter,
         CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_sz,
         i.inter * 1.0 / (sa.sz + sb.sz - i.inter) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, inter, union_sz,
       round(jaccard + 1e-9, 4) + 0.0 AS jaccard,
       CAST(row_number() OVER (ORDER BY jaccard DESC, doc_a ASC, doc_b ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 20"""

ORACLES["q_incremental_dedup"] = """WITH prior AS (
  SELECT DISTINCT md5(text) AS text_hash FROM documents WHERE doc_id % 3 = 0
),
newd AS (
  SELECT doc_id, md5(text) AS text_hash FROM documents WHERE doc_id % 3 <> 0
),
m AS (
  SELECT doc_id, text_hash,
         min(doc_id) OVER (PARTITION BY text_hash) AS min_id
  FROM newd
)
SELECT doc_id, text_hash,
       CASE WHEN text_hash IN (SELECT text_hash FROM prior) THEN 'seen_in_prior'
            WHEN doc_id <> min_id THEN 'dup_in_batch'
            ELSE 'kept' END AS status
FROM m"""

ORACLES["q_jaccard_topk_capped"] = f"""WITH {_SHINGLES},
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 50
),
sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM capped a JOIN capped b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.doc_a, i.doc_b,
         CAST(i.inter AS BIGINT) AS inter,
         CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_sz,
         i.inter * 1.0 / (sa.sz + sb.sz - i.inter) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
)
SELECT doc_a, doc_b, inter, union_sz,
       round(jaccard + 1e-9, 4) + 0.0 AS jaccard,
       CAST(row_number() OVER (ORDER BY jaccard DESC, doc_a ASC, doc_b ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 20"""

_SIGS = f"""{_SHINGLES},
sigs AS (
  SELECT doc_id, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minhash
  FROM shingles CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
  GROUP BY doc_id, seed
)"""

ORACLES["q_minhash_signatures"] = f"""WITH {_SIGS}
SELECT doc_id, CAST(seed AS INT) AS seed, minhash FROM sigs"""

ORACLES["q_lsh_pairs"] = f"""WITH {_SIGS},
banded AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, 2
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS n_bands
FROM banded a JOIN banded b USING (band, band_key)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2"""

ORACLES["q_lsh_verified_dedup"] = f"""WITH {_SIGS},
banded AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, 2
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_bands
  FROM banded a JOIN banded b USING (band, band_key)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b, c.n_bands,
       CAST(i.inter AS BIGINT) AS inter,
       CAST(sa.sz + sb.sz - i.inter AS BIGINT) AS union_sz,
       round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter) + 1e-9, 4) + 0.0 AS jaccard
FROM cand c
JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
JOIN sizes sa ON sa.doc_id = c.doc_a
JOIN sizes sb ON sb.doc_id = c.doc_b"""

ORACLES["q_simhash"] = f"""WITH tok AS (
  SELECT doc_id, ('0x' || substr(md5(unnest({_TOKS})), 1, 8))::BIGINT AS h
  FROM documents
),
votes AS (
  SELECT doc_id, i, sum(2 * ((h >> i) & 1) - 1) AS v
  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS i) b
  GROUP BY doc_id, i
)
SELECT doc_id,
       CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id"""

ORACLES["q_corpus_filter"] = f"""WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM documents
),
s AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         length(text) * 1.0 / len(tk) AS avg_tok_len,
         length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digit_ratio,
         len(list_filter(tk, x -> x IN ('the','a','and','of','to'))) * 1.0 / len(tk) AS stopword_ratio
  FROM t
),
q AS (
  SELECT doc_id, n_tokens,
         greatest(0.0,
           1.0 - least(1.0, abs(avg_tok_len - 5.0) / 10.0) * 0.4
               - least(1.0, digit_ratio * 5.0) * 0.3
               - CASE WHEN stopword_ratio <= 0.0 THEN 0.3 ELSE 0.0 END) AS quality
  FROM s
),
k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
SELECT q.doc_id,
       CAST(CASE WHEN k.doc_id IS NOT NULL AND q.quality >= 0.5
                  AND q.n_tokens BETWEEN 8 AND 200 THEN 1 ELSE 0 END AS BIGINT) AS kept,
       CAST(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS uniq,
       q.n_tokens
FROM q LEFT JOIN k ON k.doc_id = q.doc_id"""

_NORMED = """normed AS (
  SELECT vec_id,
         embedding,
         sqrt((SELECT sum(embedding[i]::DOUBLE * embedding[i]::DOUBLE)
               FROM generate_series(1, 64) t(i))) AS nrm
  FROM embeddings
)"""

ORACLES["q_cosine_topk"] = f"""WITH {_NORMED},
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
         (SELECT sum(q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (q.nrm * c.nrm) AS cosine
  FROM normed q CROSS JOIN normed c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT q_id, nn_id, round(cosine + 1e-9, 4) + 0.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, nn_id ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 5"""

ORACLES["q_index_knn"] = """WITH pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
         sqrt((SELECT sum(pow(q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE, 2))
               FROM generate_series(1, 64) t(i))) AS dist
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 10
)
SELECT q_id, nn_id, round(dist + 1e-9, 4) + 0.0 AS dist,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, nn_id ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 3"""

ORACLES["q_sq_ann"] = """WITH dims AS (
  SELECT vec_id, i AS dim, embedding[i + 1]::DOUBLE AS v
  FROM embeddings, generate_series(0, 63) t(i)
),
stats AS (
  SELECT dim, min(v) AS vmin, max(v) AS vmax FROM dims GROUP BY dim
),
sym AS (
  SELECT d.vec_id, d.dim,
         CASE WHEN s.vmax - s.vmin < 1e-12 THEN 0
              ELSE least(15, greatest(0,
                   CAST(floor((d.v - s.vmin) * 16 / (s.vmax - s.vmin)) AS INT))) END AS sym,
         s.vmin,
         CASE WHEN s.vmax - s.vmin < 1e-12 THEN 0.0
              ELSE (s.vmax - s.vmin) / 16 END AS step
  FROM dims d JOIN stats s USING (dim)
),
recon AS (
  SELECT vec_id, dim, vmin + (sym + 0.5) * step AS r FROM sym
),
d AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
         sum(pow(q.r - c.r, 2)) AS sqdist
  FROM recon q JOIN recon c USING (dim)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
  GROUP BY 1, 2
)
SELECT q_id, nn_id, round(sqdist + 1e-9, 4) + 0.0 AS sqdist,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY sqdist ASC, nn_id ASC) AS INT) AS rk
FROM d QUALIFY rk <= 3"""

ORACLES["q_index_range"] = """WITH pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
         sqrt((SELECT sum(pow(q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE, 2))
               FROM generate_series(1, 64) t(i))) AS dist
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 10
)
SELECT q_id, nn_id, round(dist + 1e-9, 4) + 0.0 AS dist
FROM pairs WHERE dist <= 10.0"""

_BUCKETED = """bucketed AS (
  SELECT vec_id, embedding, nrm,
         (SELECT CAST(sum(CASE WHEN embedding[i+1]::DOUBLE > 0
                          THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT)
          FROM generate_series(0, 5) t(i)) AS bucket
  FROM normed
)"""

ORACLES["q_cosine_ivf"] = f"""WITH {_NORMED},
{_BUCKETED},
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id, q.bucket,
         (SELECT sum(q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (q.nrm * c.nrm) AS cosine
  FROM bucketed q JOIN bucketed c USING (bucket)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
)
SELECT q_id, nn_id, bucket, round(cosine + 1e-9, 4) + 0.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, nn_id ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 3"""

# multi-probe: own bucket + flips of the two smallest-|coordinate| sign
# bits (mirrors similarity.probe_buckets_expr — sort by (margin, j))
ORACLES["q_cosine_multiprobe"] = f"""WITH {_NORMED},
{_BUCKETED},
probed AS (
  SELECT vec_id, embedding, nrm, bucket,
         list_sort(list_transform(range(0, 6),
             j -> {{'m': abs(embedding[j + 1]::DOUBLE), 'j': j}})) AS ms
  FROM bucketed WHERE vec_id < 10
),
qprobes AS (
  SELECT vec_id, embedding, nrm,
         unnest([bucket,
                 xor(bucket, CAST(1 AS BIGINT) << ms[1].j),
                 xor(bucket, CAST(1 AS BIGINT) << ms[2].j),
                 xor(xor(bucket, CAST(1 AS BIGINT) << ms[1].j),
                     CAST(1 AS BIGINT) << ms[2].j)]) AS bucket
  FROM probed
),
pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
         (SELECT sum(q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (q.nrm * c.nrm) AS cosine
  FROM qprobes q JOIN bucketed c USING (bucket)
  WHERE q.vec_id <> c.vec_id
)
SELECT q_id, nn_id, round(cosine + 1e-9, 4) + 0.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, nn_id ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 3"""

ORACLES["q_embed_neardup"] = f"""WITH {_NORMED},
{_BUCKETED},
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         (SELECT sum(a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (a.nrm * b.nrm) AS cosine
  FROM bucketed a JOIN bucketed b USING (bucket)
  WHERE a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, round(cosine + 1e-9, 4) + 0.0 AS cosine
FROM pairs WHERE cosine >= 0.35"""

ORACLES["q_bm25_search"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
tf AS (
  SELECT doc_id, len(tk) AS dl, u.term, CAST(count(*) AS DOUBLE) AS tf
  FROM t, unnest(tk) AS u(term)
  GROUP BY 1, 2, 3
),
hits AS (
  SELECT * FROM tf WHERE term IN ('query', 'filter', 'join')
),
corpus AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(tk)) AS avgdl FROM t
),
dfreq AS (
  SELECT term, CAST(count(*) AS DOUBLE) AS df FROM hits GROUP BY 1
),
scored AS (
  SELECT h.doc_id,
         sum(ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
             * h.tf * 2.2 / (h.tf + 1.2 * (0.25 + 0.75 * h.dl / c.avgdl))
         ) AS score
  FROM hits h JOIN dfreq d USING (term) CROSS JOIN corpus c
  GROUP BY 1
)
SELECT doc_id, round(score + 1e-9, 4) + 0.0 AS score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rk
FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10"""

ORACLES["q_ngram_topk"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
grams AS (
  SELECT tk[j] || ' ' || tk[j+1] AS gram
  FROM (SELECT tk, unnest(generate_series(1, len(tk) - 1)) AS j FROM t)
),
counts AS (
  SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM grams GROUP BY 1
)
SELECT gram, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, gram ASC) AS INT) AS rk
FROM counts ORDER BY cnt DESC, gram ASC LIMIT 20"""


# IVF-Flat with data-derived centroids (q_cosine_kmeans trains iters=0 →
# centroids are the vectors with vec_id < 8; assignment = argmin sqdist
# with centroid_id tiebreak, queries probe their 2 nearest lists)
ORACLES["q_cosine_kmeans"] = f"""WITH {_NORMED},
cents AS (
  SELECT CAST(vec_id AS INT) AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT n.vec_id, n.embedding, n.nrm, c.centroid_id,
         (SELECT sum((n.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
                     * (n.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE))
          FROM generate_series(1, 64) t(i)) AS d
  FROM normed n CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY d ASC, centroid_id ASC) AS crk
  FROM a
),
home AS (SELECT vec_id, embedding, nrm, centroid_id FROM ranked WHERE crk = 1),
probes AS (
  SELECT vec_id, embedding, nrm, centroid_id
  FROM ranked WHERE crk <= 2 AND vec_id < 10
),
pairs AS (
  SELECT q.vec_id AS q_id, h.vec_id AS nn_id,
         (SELECT sum(q.embedding[i]::DOUBLE * h.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (q.nrm * h.nrm) AS cosine
  FROM probes q JOIN home h USING (centroid_id)
  WHERE q.vec_id <> h.vec_id
)
SELECT q_id, nn_id, round(cosine + 1e-9, 4) + 0.0 AS cosine,
       CAST(row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, nn_id ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 3"""

# near-dup pairs → connected-component groups (min-id canonical):
# LSH candidates verified at jaccard >= 0.5, then transitive closure
ORACLES["q_dedup_groups"] = f"""WITH RECURSIVE {_SIGS},
banded AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, 2
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b USING (band, band_key)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
ver AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c
  JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
  JOIN sizes sa ON sa.doc_id = c.doc_a
  JOIN sizes sb ON sb.doc_id = c.doc_b
  WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM ver
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM ver
),
reach(node, root) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
),
grp AS (SELECT node AS doc_id, min(root) AS group_id FROM reach GROUP BY node)
SELECT d.doc_id,
       coalesce(g.group_id, d.doc_id) AS group_id,
       coalesce(g.group_id, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN grp g USING (doc_id)"""


# deterministic md5-gated sampling (operators/sample.py): unit hash =
# first 8 hex chars of md5('s:' || key) / 2^32
_HUNIT = "(('0x' || substr(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"

ORACLES["q_hash_sample"] = f"""SELECT doc_id, lang FROM documents
WHERE {_HUNIT} < 0.2"""

ORACLES["q_stratified_sample"] = f"""SELECT doc_id, lang FROM documents
WHERE {_HUNIT} < (CASE lang WHEN 'en' THEN 0.5 WHEN 'zh' THEN 0.25 ELSE 0.1 END)"""

ORACLES["q_hash_top_n"] = f"""SELECT doc_id, lang FROM documents
ORDER BY {_HUNIT} ASC, doc_id ASC LIMIT 100"""


# streaming quality gate (stateless projection) == batch quality filter;
# the gate compares the UNROUNDED quality to 0.5, rounding only at output
ORACLES["q_stream_ingest_gate"] = f"""WITH t AS (
  SELECT doc_id, lang, text, {_TOKS} AS tk FROM documents
),
s AS (
  SELECT doc_id, lang,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         length(text) * 1.0 / len(tk) AS avg_tok_len,
         length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digit_ratio,
         len(list_filter(tk, x -> x IN ('the','a','and','of','to'))) * 1.0 / len(tk) AS stopword_ratio
  FROM t
),
q AS (
  SELECT doc_id, lang, n_tokens,
         greatest(0.0,
           1.0 - least(1.0, abs(avg_tok_len - 5.0) / 10.0) * 0.4
               - least(1.0, digit_ratio * 5.0) * 0.3
               - CASE WHEN stopword_ratio <= 0.0 THEN 0.3 ELSE 0.0 END) AS quality
  FROM s
)
SELECT doc_id, lang, n_tokens, round(quality + 1e-9, 4) + 0.0 AS quality
FROM q WHERE quality >= 0.7"""


# BPE-ish token estimate (mirrors text.BPE_ISH_PATTERN — RE2-safe)
ORACLES["q_token_estimate"] = f"""WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk,
         regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+') AS bpe
  FROM documents
)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS ws_tokens,
       CAST(len(bpe) AS BIGINT) AS bpe_ish_tokens,
       round(length(text) * 1.0 / len(bpe) + 1e-9, 4) + 0.0 AS chars_per_token
FROM t"""

ORACLES["q_pii_stats"] = """SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, 'https?://[^\\s]+')) AS BIGINT) AS n_urls,
  CAST((CASE WHEN contains(lower(text), 'all rights reserved') THEN 1 ELSE 0 END)
     + (CASE WHEN contains(lower(text), 'click here') THEN 1 ELSE 0 END)
     + (CASE WHEN contains(lower(text), 'terms of service') THEN 1 ELSE 0 END)
     + (CASE WHEN contains(lower(text), 'lorem ipsum') THEN 1 ELSE 0 END) AS INT) AS boilerplate_hits
FROM documents"""


# ---- corpus-preparation passes (operators/corpus.py) ----

ORACLES["q_repetition_stats"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
tok AS (SELECT doc_id, unnest(tk) AS tok FROM t),
per_tok AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
ts AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct
  FROM per_tok GROUP BY 1
),
bi AS (
  SELECT doc_id, tk[j] || ' ' || tk[j+1] AS bigram
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS j FROM t)
),
per_bi AS (SELECT doc_id, bigram, count(*) AS cnt FROM bi GROUP BY 1, 2),
bs AS (
  SELECT doc_id, sum(cnt) AS n_bigrams, max(cnt) AS top_cnt,
         sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_occ
  FROM per_bi GROUP BY 1
)
SELECT ts.doc_id, n_tokens, n_distinct,
       round(1.0 - n_distinct * 1.0 / n_tokens + 1e-9, 4) + 0.0 AS dup_token_frac,
       round(coalesce(top_cnt * 2.0 / n_tokens, 0.0) + 1e-9, 4) + 0.0 AS top_bigram_frac,
       round(coalesce(dup_occ * 1.0 / n_bigrams, 0.0) + 1e-9, 4) + 0.0 AS dup_bigram_frac
FROM ts LEFT JOIN bs USING (doc_id)"""

# gopher_filter: token_stats ⋈ repetition_stats, rule verdicts
# (bounds mirror corpus.GOPHER_BOUNDS)
ORACLES["q_gopher_filter"] = f"""WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM documents
),
ts AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         length(text) * 1.0 / len(tk) AS avg_tok_len,
         len(list_filter(tk, x -> x IN ('the','a','and','of','to'))) * 1.0 / len(tk) AS stopword_ratio
  FROM t
),
tok AS (SELECT doc_id, unnest(tk) AS tok FROM t),
per_tok AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
rs AS (
  SELECT doc_id, sum(cnt) AS n_tok, count(*) AS n_distinct
  FROM per_tok GROUP BY 1
),
bi AS (
  SELECT doc_id, tk[j] || ' ' || tk[j+1] AS bigram
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS j FROM t)
),
per_bi AS (SELECT doc_id, bigram, count(*) AS cnt FROM bi GROUP BY 1, 2),
bs AS (SELECT doc_id, max(cnt) AS top_cnt FROM per_bi GROUP BY 1),
j AS (
  SELECT ts.doc_id, ts.n_tokens, ts.avg_tok_len, ts.stopword_ratio,
         1.0 - rs.n_distinct * 1.0 / rs.n_tok AS dup_token_frac,
         coalesce(bs.top_cnt * 2.0 / rs.n_tok, 0.0) AS top_bigram_frac
  FROM ts JOIN rs USING (doc_id) LEFT JOIN bs USING (doc_id)
)
SELECT doc_id,
  CAST(CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS ok_len,
  CAST(CASE WHEN avg_tok_len BETWEEN 2.0 AND 12.0 THEN 1 ELSE 0 END AS BIGINT) AS ok_tok_len,
  CAST(CASE WHEN stopword_ratio * n_tokens >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS ok_stopwords,
  CAST(CASE WHEN dup_token_frac <= 0.9 AND top_bigram_frac <= 0.4 THEN 1 ELSE 0 END AS BIGINT) AS ok_repetition,
  CAST(CASE WHEN n_tokens BETWEEN 10 AND 100000
         AND avg_tok_len BETWEEN 2.0 AND 12.0
         AND stopword_ratio * n_tokens >= 0.5
         AND dup_token_frac <= 0.9 AND top_bigram_frac <= 0.4
       THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM j"""

# decontamination: corpus = doc_id % 20 != 0, benchmark = % 20 == 0;
# distinct 3-gram shingles, inverted join, per-doc overlap fraction
ORACLES["q_decontaminate"] = f"""WITH toks AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         tk[j] || ' ' || tk[j+1] || ' ' || tk[j+2] AS shingle
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS j FROM toks)
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
corp AS (SELECT * FROM sh WHERE doc_id % 20 <> 0),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles FROM corp GROUP BY 1),
hits AS (
  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
  FROM corp c JOIN bench b USING (shingle) GROUP BY 1
)
SELECT s.doc_id, s.n_shingles,
       CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       round(coalesce(h.n_contaminated, 0) * 1.0 / s.n_shingles + 1e-9, 4) + 0.0 AS contam_frac,
       CAST(CASE WHEN coalesce(h.n_contaminated, 0) * 1.0 / s.n_shingles >= 0.5 THEN 1 ELSE 0 END AS BIGINT) AS flagged
FROM sizes s LEFT JOIN hits h USING (doc_id)"""

# bloom prefilter is exact-verified downstream, so the oracle is the
# identical plain inverted join
ORACLES["q_bloom_decontaminate"] = ORACLES["q_decontaminate"]

# sequence packing: md5 hash shards ('pack:' salt), per-shard cumsum
ORACLES["q_sequence_pack"] = f"""WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
         (('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 4) AS shard
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM t
)
SELECT doc_id, shard, n_tokens, start_tok,
       CAST(floor(start_tok / 64.0) AS BIGINT) AS seq_first,
       CAST(floor((start_tok + n_tokens - 1) / 64.0) AS BIGINT) AS seq_last
FROM c"""


# streaming near-dup vs static reference (even doc_ids): stream-static
# band-key join == this batch band self-join restricted to even refs
ORACLES["q_stream_near_dup"] = f"""WITH {_SIGS},
banded AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, 2
)
SELECT DISTINCT a.doc_id AS doc_id, b.doc_id AS ref_doc_id
FROM banded a JOIN banded b USING (band, band_key)
WHERE b.doc_id % 2 = 0 AND a.doc_id <> b.doc_id"""


# PQ ADC ANN with data-derived codebook (q_pq_ann trains iters=0 →
# subspace-s code c = dims [s*16+1, s*16+16] of the vec_id=c vector;
# encode = per-(vec, sub) argmin with code tiebreak; ADC pair distance
# = sum over subs of sqdist(query subvector, codeword of the corpus
# vector's code))
ORACLES["q_pq_ann"] = """WITH cb AS (
  SELECT s.s AS sub, CAST(e.vec_id AS INT) AS code, e.embedding
  FROM embeddings e, generate_series(0, 3) s(s)
  WHERE e.vec_id < 16
),
enc AS (
  SELECT v.vec_id, c.sub, c.code,
         (SELECT sum((v.embedding[c.sub * 16 + i]::DOUBLE - c.embedding[c.sub * 16 + i]::DOUBLE)
                     * (v.embedding[c.sub * 16 + i]::DOUBLE - c.embedding[c.sub * 16 + i]::DOUBLE))
          FROM generate_series(1, 16) t(i)) AS d
  FROM embeddings v CROSS JOIN cb c
),
codes AS (
  SELECT vec_id, sub, code FROM enc
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) = 1
),
adc AS (
  SELECT q.vec_id AS q_id, x.vec_id AS nn_id,
         sum((SELECT sum((q.embedding[x.sub * 16 + i]::DOUBLE - cbv.embedding[x.sub * 16 + i]::DOUBLE)
                         * (q.embedding[x.sub * 16 + i]::DOUBLE - cbv.embedding[x.sub * 16 + i]::DOUBLE))
              FROM generate_series(1, 16) t(i))) AS adc_dist
  FROM embeddings q
  CROSS JOIN codes x
  JOIN cb cbv ON cbv.sub = x.sub AND cbv.code = x.code
  WHERE q.vec_id < 10 AND q.vec_id <> x.vec_id
  GROUP BY 1, 2
)
SELECT q_id, nn_id, round(adc_dist + 1e-9, 4) + 0.0 AS adc_dist,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, nn_id ASC) AS INT) AS rk
FROM adc QUALIFY rk <= 3"""


# cluster assignment with data-derived centroids (iters=0 → vec_id < 8)
ORACLES["q_embed_clusters"] = """WITH cents AS (
  SELECT CAST(vec_id AS INT) AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT e.vec_id, c.centroid_id,
         (SELECT sum((e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
                     * (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE))
          FROM generate_series(1, 64) t(i)) AS d
  FROM embeddings e CROSS JOIN cents c
),
home AS (
  SELECT vec_id, centroid_id FROM a
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, centroid_id ASC) = 1
)
SELECT vec_id, centroid_id,
       CAST(count(*) OVER (PARTITION BY centroid_id) AS BIGINT) AS cluster_size
FROM home"""


# IVF-PQ ADC with data-derived coarse (vec_id < 8) + residual codebook
# (vec_id < 16): home = argmin sqdist; resid = v − home centroid;
# codeword (s, c) = resid slice of vec_id c; queries probe 2 lists with
# list-specific residual LUTs
ORACLES["q_ivfpq_ann"] = """WITH cents AS (
  SELECT CAST(vec_id AS INT) AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT e.vec_id, c.centroid_id,
         (SELECT sum((e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
                     * (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE))
          FROM generate_series(1, 64) t(i)) AS d
  FROM embeddings e CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY d ASC, centroid_id ASC) AS crk
  FROM a
),
resv AS (
  SELECT e.vec_id, r.centroid_id AS home_c,
         list_transform(generate_series(1, 64),
                        i -> e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE) AS resid
  FROM embeddings e
  JOIN ranked r ON r.vec_id = e.vec_id AND r.crk = 1
  JOIN cents c ON c.centroid_id = r.centroid_id
),
cbr AS (
  SELECT s.s AS sub, CAST(r.vec_id AS INT) AS code, r.resid
  FROM resv r, generate_series(0, 3) s(s) WHERE r.vec_id < 16
),
encd AS (
  SELECT v.vec_id, b.sub, b.code,
         (SELECT sum((v.resid[b.sub * 16 + i] - b.resid[b.sub * 16 + i])
                     * (v.resid[b.sub * 16 + i] - b.resid[b.sub * 16 + i]))
          FROM generate_series(1, 16) t(i)) AS d
  FROM resv v CROSS JOIN cbr b
),
codes AS (
  SELECT vec_id, sub, code FROM encd
  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d ASC, code ASC) = 1
),
probes AS (
  SELECT vec_id AS q_id, centroid_id FROM ranked WHERE crk <= 2 AND vec_id < 10
),
adc AS (
  SELECT p.q_id, v.vec_id AS nn_id,
         sum((SELECT sum(((q.embedding[x.sub * 16 + i]::DOUBLE - pc.cvec[x.sub * 16 + i]::DOUBLE) - cbv.resid[x.sub * 16 + i])
                         * ((q.embedding[x.sub * 16 + i]::DOUBLE - pc.cvec[x.sub * 16 + i]::DOUBLE) - cbv.resid[x.sub * 16 + i]))
              FROM generate_series(1, 16) t(i))) AS adc_dist
  FROM probes p
  JOIN cents pc ON pc.centroid_id = p.centroid_id
  JOIN embeddings q ON q.vec_id = p.q_id
  JOIN resv v ON v.home_c = p.centroid_id
  JOIN codes x ON x.vec_id = v.vec_id
  JOIN cbr cbv ON cbv.sub = x.sub AND cbv.code = x.code
  WHERE v.vec_id <> p.q_id
  GROUP BY 1, 2
)
SELECT q_id, nn_id, round(adc_dist + 1e-9, 4) + 0.0 AS adc_dist,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_dist ASC, nn_id ASC) AS INT) AS rk
FROM adc QUALIFY rk <= 3"""


# cluster-balanced sample: home-centroid assignment (data-derived
# centroids, vec_id < 8) then the 40 smallest 'cap:'-salted hashes per
# cluster — the q_embed_clusters assignment composed with the
# q_domain_cap winner rule
ORACLES["q_cluster_balanced_sample"] = """WITH cents AS (
  SELECT CAST(vec_id AS INT) AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT e.vec_id, c.centroid_id,
         (SELECT sum((e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
                     * (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE))
          FROM generate_series(1, 64) t(i)) AS d
  FROM embeddings e CROSS JOIN cents c
),
home AS (
  SELECT vec_id, centroid_id FROM a
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, centroid_id ASC) = 1
)
SELECT vec_id, centroid_id FROM home
QUALIFY row_number() OVER (
  PARTITION BY centroid_id
  ORDER BY (('0x' || substr(md5('cap:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) ASC,
           vec_id ASC) <= 40"""


# per-domain cap: 5 smallest 'cap:'-salted hashes per source
ORACLES["q_domain_cap"] = """SELECT doc_id, source FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY (('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0) ASC,
           doc_id ASC) <= 5"""


# ---- r4 curation additions (pii_redact / lm_perplexity / dup_spans /
# mixture_sample) ----

_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"

ORACLES["q_pii_redact"] = f"""SELECT doc_id,
  regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_URL_RE}', '<URL>', 'g') AS redacted,
  CAST(len(regexp_extract_all(text, '{_EMAIL_RE}'))
     + len(regexp_extract_all(text, '{_URL_RE}')) AS BIGINT) AS n_redacted
FROM documents"""

# add-k bigram LM perplexity: every ln term rounded to 6 dp (nudged)
# and decimal-summed — the engine-determinism contract of
# operators/text.lm_perplexity
ORACLES["q_lm_perplexity"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
ev AS (
  SELECT doc_id, tk[j] AS w1, tk[j+1] AS w2
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS j FROM t)
),
bg AS (SELECT w1, w2, count(*) AS c12 FROM ev GROUP BY w1, w2),
ctx AS (SELECT w1, count(*) AS c1 FROM ev GROUP BY w1),
v AS (
  SELECT count(DISTINCT w) AS V
  FROM (SELECT unnest(tk) AS w FROM t)
),
scored AS (
  SELECT ev.doc_id,
         CAST(round(ln((bg.c12 + 0.5) / (ctx.c1 + 0.5 * v.V)) + 1e-9, 6) + 0.0
              AS DECIMAL(18,6)) AS logp
  FROM ev JOIN bg USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
),
per AS (
  SELECT doc_id, count(*) AS n, CAST(SUM(logp) AS DOUBLE) / count(*) AS a
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bigrams,
       round(a + 1e-9, 4) + 0.0 AS avg_logp,
       round(exp(-a) + 1e-9, 4) + 0.0 AS ppl
FROM per"""

ORACLES["q_dup_spans"] = f"""WITH t AS (
  SELECT doc_id, {_TOKS} AS tk FROM documents
),
pos AS (
  SELECT doc_id, j - 1 AS p,
         tk[j] || ' ' || tk[j+1] || ' ' || tk[j+2] || ' ' || tk[j+3]
               || ' ' || tk[j+4] AS gram
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 4)) AS j
        FROM t WHERE len(tk) >= 5)
),
dg AS (
  SELECT gram
  FROM (SELECT DISTINCT doc_id, gram FROM pos)
  GROUP BY gram HAVING count(*) >= 2
),
cov AS (
  SELECT doc_id,
         least(5, coalesce(lead(p) OVER (PARTITION BY doc_id ORDER BY p) - p,
                           5)) AS c
  FROM pos SEMI JOIN dg USING (gram)
),
per AS (SELECT doc_id, SUM(c) AS dup FROM cov GROUP BY doc_id)
SELECT t.doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CAST(coalesce(dup, 0) AS BIGINT) AS dup_tokens,
       round(coalesce(dup, 0) * 1.0 / len(tk) + 1e-9, 4) + 0.0 AS dup_span_frac
FROM t LEFT JOIN per USING (doc_id)"""

# mixture resample: N = min_s floor(n_s/p_s), k_s = floor(N*p_s), all
# integer ratios (p_s = num_s/10) — the floor(double-division) is
# exact for integers < 2^52 in both engines
ORACLES["q_mixture_sample"] = """WITH d AS (
  SELECT doc_id, lang,
         CASE lang WHEN 'en' THEN 4 WHEN 'de' THEN 2 WHEN 'fr' THEN 2
                   WHEN 'es' THEN 1 WHEN 'zh' THEN 1 END AS num
  FROM documents WHERE lang IN ('en', 'de', 'fr', 'es', 'zh')
),
cnt AS (SELECT lang, num, count(*) AS n FROM d GROUP BY lang, num),
cap AS (SELECT min(CAST(floor(n * 10 / num) AS BIGINT)) AS N FROM cnt),
rk AS (
  SELECT doc_id, lang, num,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS rn
  FROM d
)
SELECT doc_id, lang
FROM rk CROSS JOIN cap
WHERE rn <= CAST(floor(N * num / 10) AS BIGINT)"""


# streaming LM gate == the batch perplexity filter (stream-static
# joins + update-mode aggregate are exactly-once with availableNow)
ORACLES["q_stream_lm_gate"] = """SELECT * FROM (
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS tk FROM documents
),
ev AS (
  SELECT doc_id, tk[j] AS w1, tk[j+1] AS w2
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS j FROM t)
),
bg AS (SELECT w1, w2, count(*) AS c12 FROM ev GROUP BY w1, w2),
ctx AS (SELECT w1, count(*) AS c1 FROM ev GROUP BY w1),
v AS (
  SELECT count(DISTINCT w) AS V
  FROM (SELECT unnest(tk) AS w FROM t)
),
scored AS (
  SELECT ev.doc_id,
         CAST(round(ln((bg.c12 + 0.5) / (ctx.c1 + 0.5 * v.V)) + 1e-9, 6) + 0.0
              AS DECIMAL(18,6)) AS logp
  FROM ev JOIN bg USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
),
per AS (
  SELECT doc_id, count(*) AS n, CAST(SUM(logp) AS DOUBLE) / count(*) AS a
  FROM scored GROUP BY doc_id
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bigrams,
       round(a + 1e-9, 4) + 0.0 AS avg_logp,
       round(exp(-a) + 1e-9, 4) + 0.0 AS ppl
FROM per
) WHERE ppl <= 31.0"""

ORACLES["q_doc_chunks"] = """WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, 24)) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST(start_tok // 24 AS INT) AS chunk_id,
       CAST(start_tok AS INT) AS start_tok,
       CAST(len(toks[start_tok + 1 : start_tok + 32]) AS INT) AS chunk_len,
       array_to_string(toks[start_tok + 1 : start_tok + 32], ' ') AS chunk_text
FROM s"""

# random projection: the ±1 matrix is re-derived from the same integer
# hash formula (bit 16 of Knuth multiplicative on the flat index)
ORACLES["q_random_projection"] = """WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
         unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
p AS (
  SELECT vec_id, ks.k AS k,
         sum(x * (1 - 2 * ((((j * 16 + ks.k) * 2654435761) % 4294967296
                            // 65536) % 2))) AS val
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS k) ks
  GROUP BY 1, 2
)
SELECT vec_id, CAST(k AS INT) AS k, round(val + 1e-9, 4) + 0.0 AS val
FROM p"""

ORACLES["q_ann_recall"] = f"""WITH {_NORMED},
{_BUCKETED},
bp AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
         (SELECT sum(q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (q.nrm * c.nrm) AS cosine
  FROM normed q CROSS JOIN normed c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
),
brute AS (
  SELECT q_id, nn_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, nn_id ASC) AS rk
  FROM bp QUALIFY rk <= 3
),
ip AS (
  SELECT q.vec_id AS q_id, c.vec_id AS nn_id,
         (SELECT sum(q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (q.nrm * c.nrm) AS cosine
  FROM bucketed q JOIN bucketed c USING (bucket)
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id
),
ivf AS (
  SELECT q_id, nn_id,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, nn_id ASC) AS rk
  FROM ip QUALIFY rk <= 3
),
agg AS (
  SELECT b.q_id, count(*) AS n, count(i.nn_id) AS h
  FROM brute b LEFT JOIN ivf i USING (q_id, nn_id)
  GROUP BY 1
)
SELECT q_id, CAST(h AS INT) AS n_hit,
       round(h * 1.0 / n + 1e-9, 4) + 0.0 AS recall
FROM agg"""

# SemDeDup: same cents/home CTEs as q_embed_clusters, then the
# within-cluster min-id keep rule at cosine >= 0.35
ORACLES["q_semantic_dedup"] = """WITH cents AS (
  SELECT CAST(vec_id AS INT) AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < 8
),
a AS (
  SELECT e.vec_id, c.centroid_id,
         (SELECT sum((e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE)
                     * (e.embedding[i]::DOUBLE - c.cvec[i]::DOUBLE))
          FROM generate_series(1, 64) t(i)) AS d
  FROM embeddings e CROSS JOIN cents c
),
home AS (
  SELECT vec_id, centroid_id FROM a
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, centroid_id ASC) = 1
),
v AS (
  SELECT h.vec_id, h.centroid_id, e.embedding,
         sqrt((SELECT sum(e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)
               FROM generate_series(1, 64) t(i))) AS nrm
  FROM home h JOIN embeddings e USING (vec_id)
),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM v a JOIN v b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
  WHERE (SELECT sum(a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)
         FROM generate_series(1, 64) t(i)) / (a.nrm * b.nrm) >= 0.35
)
SELECT v.vec_id, v.centroid_id,
       CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS kept
FROM v LEFT JOIN dups d USING (vec_id)"""

# content-defined chunking: same polynomial code-point fold
# ((acc*31 + code) mod 2^31), boundary after tokens with h % 8 = 0
ORACLES["q_cdc_chunks"] = """WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
tok AS (
  SELECT doc_id, unnest(ts) AS tok, generate_subscripts(ts, 1) - 1 AS pos
  FROM t
),
h AS (
  SELECT doc_id, pos, tok,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
                        list_transform(regexp_split_to_array(tok, ''),
                                       c -> CAST(unicode(c) AS BIGINT))),
           (acc, x) -> (acc * 31 + x) % 2147483648) AS hh
  FROM tok
),
m AS (
  SELECT doc_id, pos, tok,
         CASE WHEN pos = 0
              OR lag(hh % 8 = 0) OVER (PARTITION BY doc_id ORDER BY pos)
              THEN 1 ELSE 0 END AS is_new
  FROM h
),
c AS (
  SELECT doc_id, pos, tok,
         sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) - 1 AS cdc_id
  FROM m
)
SELECT doc_id, CAST(cdc_id AS INT) AS cdc_id,
       CAST(min(pos) AS INT) AS start_tok,
       CAST(count(*) AS INT) AS n_toks,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
FROM c GROUP BY doc_id, cdc_id"""

# Count-Min grid + point queries: md5-derived buckets reproduce the
# Spark grid bit-for-bit; rk via row_number under the same total order
ORACLES["q_countmin_tokens"] = f"""WITH toks AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
t AS (SELECT token FROM toks WHERE len(token) > 0),
grid AS (
  SELECT row, bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT i AS row,
           (('0x' || substr(md5('cm' || CAST(i AS VARCHAR) || ':' || token), 1, 8))::BIGINT % 512) AS bucket
    FROM t, (SELECT unnest([0, 1, 2, 3]) AS i)
  ) GROUP BY 1, 2
),
true_cnt AS (
  SELECT token, CAST(count(*) AS BIGINT) AS true_cnt FROM t GROUP BY 1
),
top AS (
  SELECT token, true_cnt,
         CAST(row_number() OVER (ORDER BY true_cnt DESC, token ASC) AS INT) AS rk
  FROM true_cnt QUALIFY rk <= 20
),
probes AS (
  SELECT token, i AS row,
         (('0x' || substr(md5('cm' || CAST(i AS VARCHAR) || ':' || token), 1, 8))::BIGINT % 512) AS bucket
  FROM top, (SELECT unnest([0, 1, 2, 3]) AS i)
),
est AS (
  SELECT p.token, CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS cm_est
  FROM probes p LEFT JOIN grid g USING (row, bucket) GROUP BY 1
)
SELECT t.token, t.true_cnt, e.cm_est, t.rk FROM top t JOIN est e USING (token)"""

# HyperLogLog m=64: integer rank via length(ltrim(bin(h),'0')) (== the
# Spark 33 - length(bin(h)) form, and 33 for h=0); dyadic-exact sum
ORACLES["q_hll_distinct"] = f"""WITH toks AS (
  SELECT unnest({_TOKS}) AS token FROM documents
),
t AS (SELECT token FROM toks WHERE len(token) > 0),
h AS (
  SELECT (('0x' || substr(md5('hllb:' || token), 1, 8))::BIGINT % 64) AS bucket,
         ('0x' || substr(md5('hllr:' || token), 9, 8))::BIGINT AS h2
  FROM t
),
regs AS (
  SELECT bucket, max(33 - length(ltrim(bin(h2), '0'))) AS mx FROM h GROUP BY 1
),
agg AS (
  SELECT coalesce(sum(power(2.0, -mx)), 0.0) AS s_seen, count(*) AS n_seen FROM regs
),
est AS (
  SELECT CASE WHEN (0.709 * 64 * 64) / (s_seen + (64 - n_seen)) <= 160.0
                   AND (64 - n_seen) > 0
              THEN 64.0 * ln(64.0 / (64 - n_seen))
              ELSE (0.709 * 64 * 64) / (s_seen + (64 - n_seen)) END AS n_hll
  FROM agg
)
SELECT (SELECT CAST(count(DISTINCT token) AS BIGINT) FROM t) AS n_exact,
       round(n_hll + 1e-9, 4) + 0.0 AS n_hll FROM est"""

# jsonl roundtrip: the Spark side re-reads its own JSONL copy; a hash
# match against the parquet-derived stats proves lossless transport
ORACLES["q_jsonl_roundtrip"] = f"""SELECT doc_id, lang,
       CAST(len({_TOKS}) AS BIGINT) AS n_tokens
FROM documents"""

# streaming HLL: registers are a commutative monoid, so the stream
# reproduces the batch registers exactly — same oracle
ORACLES["q_stream_hll_distinct"] = ORACLES["q_hll_distinct"]


_SPLIT_HUNIT = "(('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"

ORACLES["q_split_assign"] = f"""SELECT doc_id, lang,
  CASE WHEN {_SPLIT_HUNIT} < 0.8 THEN 'train'
       WHEN {_SPLIT_HUNIT} < 0.9 THEN 'val'
       ELSE 'test' END AS split
FROM documents"""


# q_line_dedup: same segmentation (disjoint 10-token windows over the
# ' '-split tokens), same keep-first rule (global (doc_id, pos) order),
# same reassembly (' '-joined kept units in position order)
ORACLES["q_line_dedup"] = """WITH t AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS toks FROM documents
),
w AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS idx
  FROM t
),
u AS (
  SELECT doc_id, CAST((idx - 1) // 10 AS INT) AS pos,
         string_agg(tok, ' ' ORDER BY idx) AS unit
  FROM w GROUP BY doc_id, CAST((idx - 1) // 10 AS INT)
),
k AS (
  SELECT doc_id, pos, unit,
         row_number() OVER (PARTITION BY unit ORDER BY doc_id, pos) = 1 AS keep
  FROM u
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_units,
  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
  coalesce(string_agg(unit, ' ' ORDER BY pos) FILTER (WHERE keep), '') AS dedup_text
FROM k GROUP BY doc_id"""


ORACLES["q_hard_negatives"] = """WITH nl AS (
  SELECT vec_id, label, embedding,
         sqrt((SELECT sum(embedding[i]::DOUBLE * embedding[i]::DOUBLE)
               FROM generate_series(1, 64) t(i))) AS nrm
  FROM embeddings
),
pairs AS (
  SELECT q.vec_id AS q_id, q.label AS q_label,
         c.vec_id AS neg_id, c.label AS neg_label,
         (SELECT sum(q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)
          FROM generate_series(1, 64) t(i)) / (q.nrm * c.nrm) AS cosine
  FROM nl q CROSS JOIN nl c
  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id AND q.label <> c.label
)
SELECT q_id, q_label, neg_id, neg_label,
       round(cosine + 1e-9, 4) + 0.0 AS cosine,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neg_id ASC) AS INT) AS rk
FROM pairs QUALIFY rk <= 5"""


# streaming Count-Min: per-cell sums are a commutative monoid — the
# stream reproduces the batch grid exactly, so the oracle is shared
ORACLES["q_stream_countmin"] = ORACLES["q_countmin_tokens"]


_W_HUNIT = "(('0x' || substr(md5('w:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"

ORACLES["q_weighted_sample"] = f"""SELECT doc_id, lang, n_chars
FROM documents
ORDER BY pow({_W_HUNIT}, 1.0 / CAST(n_chars AS DOUBLE)) DESC, doc_id ASC
LIMIT 100"""


# q_hll_by_lang: the q_hll_distinct pipeline grouped by lang — same
# md5 bucket/rank hashing, same estimator with per-group registers
ORACLES["q_hll_by_lang"] = f"""WITH toks AS (
  SELECT lang, unnest({_TOKS}) AS token FROM documents
),
t AS (SELECT lang, token FROM toks WHERE len(token) > 0),
h AS (
  SELECT lang,
         (('0x' || substr(md5('hllb:' || token), 1, 8))::BIGINT % 64) AS bucket,
         ('0x' || substr(md5('hllr:' || token), 9, 8))::BIGINT AS h2
  FROM t
),
regs AS (
  SELECT lang, bucket, max(33 - length(ltrim(bin(h2), '0'))) AS mx
  FROM h GROUP BY 1, 2
),
agg AS (
  SELECT lang, coalesce(sum(power(2.0, -mx)), 0.0) AS s_seen,
         count(*) AS n_seen
  FROM regs GROUP BY lang
),
est AS (
  SELECT lang,
         CASE WHEN (0.709 * 64 * 64) / (s_seen + (64 - n_seen)) <= 160.0
                   AND (64 - n_seen) > 0
              THEN 64.0 * ln(64.0 / (64 - n_seen))
              ELSE (0.709 * 64 * 64) / (s_seen + (64 - n_seen)) END AS n_hll
  FROM agg
),
exact AS (
  SELECT lang, CAST(count(DISTINCT token) AS BIGINT) AS n_exact
  FROM t GROUP BY lang
)
SELECT e.lang, e.n_exact, round(s.n_hll + 1e-9, 4) + 0.0 AS n_hll
FROM exact e JOIN est s ON e.lang = s.lang"""


# q_edit1_pairs: the same deletion-neighborhood construction (identity
# + one-char deletions of the 24-char prefix), equality-joined on the
# signature, then EXACT levenshtein verify — DuckDB's levenshtein is
# the independent semantic check on the candidates.
ORACLES["q_edit1_pairs"] = """WITH keys AS (
  SELECT doc_id AS doc, substr(coalesce(text, ''), 1, 24) AS s
  FROM documents
), sigs AS (
  SELECT DISTINCT doc, s, sig FROM (
    SELECT doc, s,
           unnest(list_prepend(s,
             list_transform(generate_series(1, length(s)),
               i -> substr(s, 1, i - 1) || substr(s, i + 1, 24)))) AS sig
    FROM keys
  )
), cand AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
                  a.s AS s_a, b.s AS s_b
  FROM sigs a JOIN sigs b USING (sig)
  WHERE a.doc < b.doc
)
SELECT doc_a, doc_b, CAST(levenshtein(s_a, s_b) AS INT) AS dist
FROM cand
WHERE levenshtein(s_a, s_b) <= 1"""


# q_orc_roundtrip: identity over the parquet — a hash match proves the
# ORC write+read lost nothing.
ORACLES["q_orc_roundtrip"] = """SELECT doc_id, lang,
       CAST(n_chars AS BIGINT) AS n_chars,
       substr(text, 1, 16) AS prefix
FROM documents"""


# q_schema_evolution: the same two generations, unioned with NULL
# padding for the pre-evolution files.
ORACLES["q_schema_evolution"] = """SELECT doc_id, lang,
       n_chars, round(-1.0 + 1e-9, 4) + 0.0 AS quality
FROM documents WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, lang, n_chars,
       round((n_chars % 100) * 1.0 / 100.0 + 1e-9, 4) + 0.0 AS quality
FROM documents WHERE doc_id % 2 = 1"""


# q_lsh_recall: candidate set from the banded signatures, ground truth
# from the df-capped exact pairs at tau >= 0.5, counts + ratios —
# over the STRUCTURAL hash_sample(doc_id, 0.7) corpus slice the Spark
# query composes (the slice contract lives in the plan, not the docs).
ORACLES["q_lsh_recall"] = f"""WITH docs_slice AS (
  SELECT * FROM documents WHERE {_HUNIT} < 0.7
),
toks AS (
  SELECT doc_id, {_TOKS} AS tk FROM docs_slice
),
shingles AS (
  SELECT DISTINCT doc_id,
         tk[j] || ' ' || tk[j+1] || ' ' || tk[j+2] AS shingle
  FROM (
    SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 2)) AS j
    FROM toks
  )
),
sigs AS (
  SELECT doc_id, seed, min(md5(seed::VARCHAR || '|' || shingle)) AS minhash
  FROM shingles CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS seed) s
  GROUP BY doc_id, seed
),
banded AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b USING (band, band_key)
  WHERE a.doc_id < b.doc_id
),
capped AS (
  SELECT doc_id, shingle FROM shingles
  QUALIFY count(*) OVER (PARTITION BY shingle) <= 50
),
sizes AS (SELECT doc_id, count(*) AS sz FROM capped GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM capped a JOIN capped b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE i.inter * 1.0 / (sa.sz + sb.sz - i.inter) >= 0.5
),
hits AS (SELECT * FROM cand INTERSECT SELECT * FROM truth)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_true,
       (SELECT CAST(count(*) AS BIGINT) FROM cand) AS n_cand,
       (SELECT CAST(count(*) AS BIGINT) FROM hits) AS n_hit,
       round((SELECT count(*) FROM hits) * 1.0 / (SELECT count(*) FROM truth) + 1e-9, 6) + 0.0 AS recall,
       round((SELECT count(*) FROM hits) * 1.0 / (SELECT count(*) FROM cand) + 1e-9, 6) + 0.0 AS precision"""


# q_embedding_drift: per-version dim means (unnest zip with ordinality),
# dot/norms over the 64 means.
ORACLES["q_embedding_drift"] = """WITH o AS (
  SELECT dim, avg(v) AS m FROM (
    SELECT unnest(embedding) AS v,
           unnest(generate_series(1, len(embedding))) AS dim
    FROM embeddings WHERE vec_id % 2 = 0
  ) GROUP BY 1
), n AS (
  SELECT dim, avg(v) AS m FROM (
    SELECT unnest(embedding) AS v,
           unnest(generate_series(1, len(embedding))) AS dim
    FROM embeddings WHERE vec_id % 2 = 1
  ) GROUP BY 1
), s AS (
  SELECT sum(o.m * n.m) AS dot,
         sqrt(sum(o.m * o.m)) AS norm_old,
         sqrt(sum(n.m * n.m)) AS norm_new
  FROM o JOIN n USING (dim)
)
SELECT round(dot + 1e-9, 6) + 0.0 AS dot,
       round(norm_old + 1e-9, 6) + 0.0 AS norm_old,
       round(norm_new + 1e-9, 6) + 0.0 AS norm_new,
       round(dot / (norm_old * norm_new) + 1e-9, 6) + 0.0 AS cosine,
       round(norm_new / norm_old + 1e-9, 6) + 0.0 AS norm_ratio
FROM s"""


# q_phash_neardup: SimHash-derived 64-bit signatures (two 32-bit md5
# words — word 0 = md5 chars 1-8 votes bits 0-31, word 1 = chars 9-16
# votes bits 32-63, mirroring dedup.simhash_bits), 4-band blocking
# with 16-bit keys, exact Hamming verify.
ORACLES["q_phash_neardup"] = f"""WITH tok AS (
  SELECT doc_id,
         ('0x' || substr(md5(t.tk), 1, 8))::BIGINT AS h0,
         ('0x' || substr(md5(t.tk), 9, 8))::BIGINT AS h1
  FROM (SELECT doc_id, unnest({_TOKS}) AS tk FROM documents) t
),
votes AS (
  SELECT doc_id, i,
         sum(2 * ((CASE WHEN i < 32 THEN h0 ELSE h1 END >> (i % 32)) & 1) - 1) AS v
  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) b
  GROUP BY doc_id, i
), sig AS (
  SELECT doc_id AS id,
         string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY i DESC) AS h
  FROM votes GROUP BY doc_id
), banded AS (
  SELECT id, h, b AS band, substr(h, b * 16 + 1, 16) AS key
  FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS b)
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.h AS h_a, b.h AS h_b
  FROM banded a JOIN banded b USING (band, key)
  WHERE a.id < b.id
)
SELECT id_a, id_b,
       CAST(list_sum(list_transform(generate_series(1, 64),
         i -> CASE WHEN substr(h_a, i, 1) <> substr(h_b, i, 1) THEN 1 ELSE 0 END)) AS INT) AS hamming
FROM cand
WHERE list_sum(list_transform(generate_series(1, 64),
        i -> CASE WHEN substr(h_a, i, 1) <> substr(h_b, i, 1) THEN 1 ELSE 0 END)) <= 3"""


# q_bpe_tokens / q_bpe_merges: FULL merge-table replay (upgrades the
# registrations from rows-only to exact oracles — the
# APCA/stream-debounce recursive-replay trick applied to the BPE fit).
# The recursive CTE IS the trainer: each iteration the working table
# holds the whole dictionary's current segmentation; the best pair
# comes from one GROUP BY over it (count desc, then lexicographically
# smallest — exactly operators/bpe._fit_merges' tie-break), and the
# merge is applied to every word with a left-to-right greedy
# list_reduce scan (non-overlapping, same skip rule as the Python
# rewrite loop). Recursion stops after 120 merges or when the best
# count drops below min_freq=2. Each iteration's rows also carry the
# pair merged to REACH them, so the same recursion yields both the
# per-doc encode stats (encode == fit's final segmentation) and the
# merge table itself.
_BPE_RECURSION = r"""WITH RECURSIVE
toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS tk
  FROM documents
),
occur AS (
  SELECT doc_id, w AS word
  FROM (SELECT doc_id, unnest(tk) AS w FROM toks) WHERE len(w) > 0
),
dict AS (SELECT word, count(*)::BIGINT AS cnt FROM occur GROUP BY 1),
step AS (
  SELECT 0 AS it, word,
         list_concat(
           list_transform(range(1, len(word)), i -> word[i]),
           [word[len(word)] || '</w>']) AS syms,
         cnt,
         CAST(NULL AS VARCHAR) AS ml, CAST(NULL AS VARCHAR) AS mr
  FROM dict
  UNION ALL
  SELECT it + 1, word,
         list_reduce(
           list_transform(syms, s -> [s]),
           (acc, x) -> CASE WHEN acc[len(acc)] = b.l AND x[1] = b.r
                            THEN list_concat(acc[1:len(acc)-1], [b.l || b.r])
                            ELSE list_concat(acc, x) END
         ),
         cnt, b.l, b.r
  FROM step, (
    SELECT l, r, sum(c)::BIGINT AS c FROM (
      SELECT syms[i] AS l, syms[i+1] AS r, cnt AS c
      FROM step, unnest(range(1, len(syms))) u(i)
    ) GROUP BY l, r
    ORDER BY c DESC, l, r LIMIT 1
  ) b
  WHERE it < 120 AND b.c >= 2
)"""

ORACLES["q_bpe_tokens"] = _BPE_RECURSION + """,
final AS (
  SELECT word, len(syms) AS n_tok
  FROM step WHERE it = (SELECT max(it) FROM step)
),
per_doc AS (
  SELECT o.doc_id, count(*)::BIGINT AS n_words,
         sum(f.n_tok)::BIGINT AS n_bpe_tokens
  FROM occur o JOIN final f USING (word) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_words, 0)::BIGINT AS n_words,
       coalesce(p.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens,
       CASE WHEN coalesce(p.n_words, 0) > 0
            THEN round(p.n_bpe_tokens * 1.0 / p.n_words + 1e-9, 4) + 0.0
            ELSE 0.0 END AS bpe_per_word
FROM documents d LEFT JOIN per_doc p USING (doc_id)"""

ORACLES["q_bpe_merges"] = _BPE_RECURSION + """
SELECT DISTINCT CAST(it - 1 AS INT) AS merge_rank, ml AS lhs, mr AS rhs
FROM step WHERE it >= 1"""


# q_incremental_neardup: band index of the prior slice probes the new
# batch; within-batch collisions keyed to the lower doc_id.
ORACLES["q_incremental_neardup"] = f"""WITH {_SIGS},
banded AS (
  SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY seed)) AS band_key
  FROM sigs GROUP BY doc_id, 2
),
prior AS (
  SELECT DISTINCT band, band_key FROM banded WHERE doc_id % 3 = 0
),
nb AS (SELECT * FROM banded WHERE doc_id % 3 <> 0),
prior_hits AS (
  SELECT doc_id, count(*)::BIGINT AS n_prior
  FROM nb JOIN prior USING (band, band_key) GROUP BY 1
),
batch_hits AS (
  SELECT a.doc_id, count(*)::BIGINT AS n_batch
  FROM nb a JOIN nb b USING (band, band_key)
  WHERE b.doc_id < a.doc_id GROUP BY 1
)
SELECT d.doc_id,
       CASE WHEN p.n_prior IS NOT NULL THEN 'near_prior'
            WHEN h.n_batch IS NOT NULL THEN 'near_batch'
            ELSE 'kept' END AS status,
       coalesce(p.n_prior, 0)::BIGINT AS n_prior_hits,
       coalesce(h.n_batch, 0)::BIGINT AS n_batch_hits
FROM (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 3 <> 0) d
LEFT JOIN prior_hits p USING (doc_id)
LEFT JOIN batch_hits h USING (doc_id)"""


# q_quality_classifier — surrogate oracle (r6, upgraded from
# rows-only): held-out doc identity + constant-TRUE invariants (pred
# in {0,1}; held-out agreement with the SQL-mirrored Gopher rule
# >= 0.85 — the distillation floor a broken solver would trip).
ORACLES["q_quality_classifier"] = """SELECT doc_id,
       TRUE AS pred_in_domain, TRUE AS rule_acc_floor_met
FROM documents WHERE doc_id % 2 <> 0"""


# q_curation_pipeline: the whole curation chain in ONE statement —
# gopher verdict CTEs, exact-dedup keeper rule, rounded quality gate,
# md5 split ladder, per-split report.
ORACLES["q_curation_pipeline"] = f"""WITH t AS (
  SELECT doc_id, text, {_TOKS} AS tk FROM documents
),
ts AS (
  SELECT doc_id,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         length(text) * 1.0 / len(tk) AS avg_tok_len,
         length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text) AS digit_ratio,
         len(list_filter(tk, x -> x IN ('the','a','and','of','to'))) * 1.0 / len(tk) AS stopword_ratio
  FROM t
),
tok AS (SELECT doc_id, unnest(tk) AS tok FROM t),
per_tok AS (SELECT doc_id, tok, count(*) AS cnt FROM tok GROUP BY 1, 2),
rs AS (
  SELECT doc_id, sum(cnt) AS n_tok, count(*) AS n_distinct
  FROM per_tok GROUP BY 1
),
bi AS (
  SELECT doc_id, tk[j] || ' ' || tk[j+1] AS bigram
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS j FROM t)
),
per_bi AS (SELECT doc_id, bigram, count(*) AS cnt FROM bi GROUP BY 1, 2),
bs AS (SELECT doc_id, max(cnt) AS top_cnt FROM per_bi GROUP BY 1),
gk AS (
  SELECT ts.doc_id
  FROM ts JOIN rs USING (doc_id) LEFT JOIN bs USING (doc_id)
  WHERE ts.n_tokens BETWEEN 10 AND 100000
    AND ts.avg_tok_len BETWEEN 2.0 AND 12.0
    AND ts.stopword_ratio * ts.n_tokens >= 0.5
    AND 1.0 - rs.n_distinct * 1.0 / rs.n_tok <= 0.9
    AND coalesce(bs.top_cnt * 2.0 / rs.n_tok, 0.0) <= 0.4
),
keepers AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
surv AS (
  SELECT doc_id FROM gk
  INTERSECT SELECT doc_id FROM keepers
),
sel AS (
  SELECT s.doc_id, ts.n_tokens
  FROM surv s JOIN ts USING (doc_id)
  WHERE round(greatest(0.0,
          1.0 - least(1.0, abs(ts.avg_tok_len - 5.0) / 10.0) * 0.4
              - least(1.0, ts.digit_ratio * 5.0) * 0.3
              - CASE WHEN ts.stopword_ratio <= 0.0 THEN 0.3 ELSE 0.0 END)
        + 1e-9, 4) + 0.0 >= 0.5
)
SELECT CASE WHEN {_SPLIT_HUNIT} < 0.8 THEN 'train'
            WHEN {_SPLIT_HUNIT} < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM sel
GROUP BY 1"""
