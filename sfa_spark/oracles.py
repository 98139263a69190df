"""DuckDB oracle SQL mirroring sfa_spark/queries.py expression-for-
expression (same rounding, same casts, same tie-breaks).

The driver registers the parquet tables as views named
region nation customer supplier part orders lineitem events documents
embeddings, then compares row-count + schema + order-insensitive
value-hash against the Spark result.
"""

from __future__ import annotations

W, L, A = 16, 4, 4
ROLL_W = 8
N_LABELS = 3
TEST_MOD = 5
TOPK = 3

SERIES = """series AS (
  SELECT user_id AS series_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS BIGINT) AS pos,
         value,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events
)"""


def _coef_ctes(w: int = W, l: int = L) -> str:
    return f"""{SERIES},
swin AS (
  SELECT series_id, pos, value, n,
         unnest(generate_series(greatest(pos - {w - 1}, 0), least(pos, n - {w}))) AS win
  FROM series WHERE n >= {w}
),
z AS (
  SELECT series_id, win, pos - win AS poff,
         (value - avg(value) OVER ww) /
         CASE WHEN stddev_pop(value) OVER ww < 1e-8 THEN 1.0
              ELSE stddev_pop(value) OVER ww END AS vz
  FROM swin WINDOW ww AS (PARTITION BY series_id, win)
),
paa AS (
  SELECT series_id, win, CAST(floor(poff * {l} / {w}) AS INT) AS seg, avg(vz) AS coef
  FROM z GROUP BY series_id, win, 3
)"""


def _words_ctes(w: int = W, l: int = L, a: int = A) -> str:
    return f"""{_coef_ctes(w, l)},
stats AS (
  SELECT seg, min(coef) AS vmin, max(coef) AS vmax FROM paa GROUP BY seg
),
sym AS (
  SELECT p.series_id, p.win, p.seg,
         CASE WHEN s.vmax - s.vmin < 1e-12 THEN 0
              ELSE least({a - 1}, greatest(0,
                   CAST(floor((p.coef - s.vmin) * {a} / (s.vmax - s.vmin)) AS INT))) END AS symbol
  FROM paa p JOIN stats s USING (seg)
),
words AS (
  SELECT series_id, win,
         CAST(sum(CAST(symbol AS BIGINT) << (2 * seg)) AS BIGINT) AS word
  FROM sym GROUP BY series_id, win
)"""


def _bag_ctes(w: int = W, l: int = L, a: int = A) -> str:
    return f"""{_words_ctes(w, l, a)},
nr AS (
  SELECT series_id, win, word,
         lag(word) OVER (PARTITION BY series_id ORDER BY win) AS prev
  FROM words
),
bag AS (
  SELECT series_id, word, CAST(count(*) AS BIGINT) AS cnt
  FROM nr WHERE prev IS NULL OR word <> prev
  GROUP BY series_id, word
)"""


ORACLES: dict[str, str] = {}

ORACLES["q_znorm"] = f"""WITH {SERIES}
SELECT series_id, pos,
       round((value - avg(value) OVER ww) /
             CASE WHEN stddev_pop(value) OVER ww < 1e-8 THEN 1.0
                  ELSE stddev_pop(value) OVER ww END + 1e-9, 4) + 0.0 AS znorm
FROM series WINDOW ww AS (PARTITION BY series_id)"""

ORACLES["q_rolling_stats"] = f"""WITH {SERIES}
SELECT series_id, pos,
       round(avg(value) OVER fr + 1e-9, 4) + 0.0 AS r_mean,
       round(stddev_pop(value) OVER fr + 1e-9, 4) + 0.0 AS r_std
FROM series
WINDOW fr AS (PARTITION BY series_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND {ROLL_W - 1} FOLLOWING)
QUALIFY pos <= n - {ROLL_W}"""

ORACLES["q_sliding_count"] = f"""WITH {SERIES}
SELECT series_id, CAST(max(n) AS BIGINT) AS n,
       CAST(count(DISTINCT win) AS BIGINT) AS n_windows
FROM (
  SELECT series_id, n,
         unnest(generate_series(greatest(pos - {W - 1}, 0), least(pos, n - {W}))) AS win
  FROM series WHERE n >= {W}
) GROUP BY series_id"""

ORACLES["q_disjoint_paa"] = f"""WITH {SERIES},
dwin AS (
  SELECT series_id, CAST(floor(pos / {W}) AS BIGINT) AS win, pos % {W} AS poff, value
  FROM series WHERE pos < n - (n % {W})
),
z AS (
  SELECT series_id, win, poff,
         (value - avg(value) OVER ww) /
         CASE WHEN stddev_pop(value) OVER ww < 1e-8 THEN 1.0
              ELSE stddev_pop(value) OVER ww END AS vz
  FROM dwin WINDOW ww AS (PARTITION BY series_id, win)
)
SELECT series_id, win, CAST(floor(poff * {L} / {W}) AS INT) AS seg,
       round(avg(vz) + 1e-9, 4) + 0.0 AS paa
FROM z GROUP BY series_id, win, 3"""

ORACLES["q_sfa_words"] = f"""WITH {_words_ctes()}
SELECT series_id, win, word FROM words"""

# the streaming stateful operator must produce the SAME words as the
# batch chain — identical oracle
ORACLES["q_stream_sfa_words"] = ORACLES["q_sfa_words"]

ORACLES["q_bag_topk"] = f"""WITH {_bag_ctes()}
SELECT series_id, word, cnt,
       CAST(row_number() OVER (PARTITION BY series_id ORDER BY cnt DESC, word ASC) AS INT) AS rk
FROM bag
QUALIFY rk <= {TOPK}"""

# reference-exact equi-depth (SFA.divideEquiDepthHistogram): boundary p
# = first sorted value at 1-based rank > ceil(n/a*p), strictly above the
# previous boundary (duplicate suppression). Unrolled for A=4.
ORACLES["q_equi_depth_bins"] = f"""WITH {_coef_ctes()},
ranked AS (
  SELECT seg, coef, row_number() OVER (PARTITION BY seg ORDER BY coef) AS rn,
         count(*) OVER (PARTITION BY seg) AS n
  FROM paa
),
b1 AS (SELECT seg, min(coef) AS b FROM ranked WHERE rn > ceil(n / {A}.0 * 1) GROUP BY seg),
b2 AS (SELECT r.seg, min(r.coef) AS b FROM ranked r JOIN b1 USING (seg)
       WHERE r.rn > ceil(r.n / {A}.0 * 2) AND r.coef > b1.b GROUP BY r.seg),
b3 AS (SELECT r.seg, min(r.coef) AS b FROM ranked r JOIN b2 USING (seg)
       WHERE r.rn > ceil(r.n / {A}.0 * 3) AND r.coef > b2.b GROUP BY r.seg)
SELECT seg, bin_idx, round(b + 1e-9, 3) + 0.0 AS boundary FROM (
  SELECT seg, CAST(1 AS BIGINT) AS bin_idx, b FROM b1
  UNION ALL SELECT seg, 2, b FROM b2
  UNION ALL SELECT seg, 3, b FROM b3
)"""

ORACLES["q_equi_depth_hist"] = f"""WITH {_coef_ctes()}
SELECT seg,
       CAST(ntile({A}) OVER (PARTITION BY seg ORDER BY coef, series_id, win) - 1 AS INT) AS symbol,
       series_id, win
FROM paa"""
# note: rewritten below — histogram needs a two-level query
ORACLES["q_equi_depth_hist"] = f"""WITH {_coef_ctes()},
sym AS (
  SELECT seg,
         CAST(ntile({A}) OVER (PARTITION BY seg ORDER BY coef, series_id, win) - 1 AS INT) AS symbol
  FROM paa
)
SELECT seg, symbol, CAST(count(*) AS BIGINT) AS cnt FROM sym GROUP BY seg, symbol"""

ORACLES["q_word_bigrams"] = f"""WITH {_words_ctes()},
uni AS (
  SELECT series_id, (word << 9) | {W} AS key FROM words
),
bi AS (
  SELECT series_id, (prev << 32) | ((word << 9) | {W}) AS key FROM (
    SELECT series_id, word,
           lag(word, {W}) OVER (PARTITION BY series_id ORDER BY win) AS prev
    FROM words
  ) WHERE prev IS NOT NULL AND prev <> 0
),
keys AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
kbag AS (
  SELECT series_id, key, CAST(count(*) AS BIGINT) AS cnt
  FROM keys GROUP BY series_id, key
)
SELECT key, CAST(sum(cnt) AS BIGINT) AS total,
       CAST(count(*) AS BIGINT) AS n_series
FROM kbag GROUP BY key"""

# chi-squared over the WEASEL unigram+bigram keyspace with the
# WORD_LIMIT cap engaged per key population (key >= 2^32 → bigram)
ORACLES["q_chi2_capped"] = f"""WITH {_words_ctes()},
uni AS (
  SELECT series_id, (word << 9) | {W} AS key FROM words
),
bi AS (
  SELECT series_id, (prev << 32) | ((word << 9) | {W}) AS key FROM (
    SELECT series_id, word,
           lag(word, {W}) OVER (PARTITION BY series_id ORDER BY win) AS prev
    FROM words
  ) WHERE prev IS NOT NULL AND prev <> 0
),
kbag AS (
  SELECT series_id, key, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi) GROUP BY series_id, key
),
pres AS (
  SELECT DISTINCT series_id, key, CAST(series_id % {N_LABELS} AS BIGINT) AS label
  FROM kbag WHERE cnt > 0
),
per_cw AS (
  SELECT label, key, CAST(count(*) AS DOUBLE) AS obs FROM pres GROUP BY label, key
),
per_w AS (SELECT key, sum(obs) AS tot_w FROM per_cw GROUP BY key),
per_c AS (
  SELECT label, CAST(count(*) AS DOUBLE) AS n_c
  FROM (SELECT DISTINCT series_id, CAST(series_id % {N_LABELS} AS BIGINT) AS label FROM kbag)
  GROUP BY label
),
tot AS (SELECT sum(n_c) AS n_samples FROM per_c),
chi AS (
  SELECT key, max(pow(COALESCE(obs, 0) - expd, 2) / expd) AS chi2
  FROM (
    SELECT w.key, p.obs, c.n_c / t.n_samples * w.tot_w AS expd
    FROM per_w w CROSS JOIN per_c c CROSS JOIN tot t
    LEFT JOIN per_cw p ON p.key = w.key AND p.label = c.label
  )
  GROUP BY key
)
SELECT key, round(chi2 + 1e-9, 3) + 0.0 AS chi2
FROM (
  SELECT key, chi2,
         row_number() OVER (PARTITION BY (key >= 4294967296)
                            ORDER BY chi2 DESC, key ASC) AS rk
  FROM chi
)
WHERE rk <= 25"""

ORACLES["q_chi2"] = f"""WITH {_bag_ctes()},
pres AS (
  SELECT DISTINCT series_id, word, CAST(series_id % {N_LABELS} AS BIGINT) AS label
  FROM bag WHERE cnt > 0
),
per_cw AS (
  SELECT label, word, CAST(count(*) AS DOUBLE) AS obs FROM pres GROUP BY label, word
),
per_w AS (SELECT word, sum(obs) AS tot_w FROM per_cw GROUP BY word),
per_c AS (
  SELECT label, CAST(count(*) AS DOUBLE) AS n_c
  FROM (SELECT DISTINCT series_id, CAST(series_id % {N_LABELS} AS BIGINT) AS label FROM bag)
  GROUP BY label
),
tot AS (SELECT sum(n_c) AS n_samples FROM per_c)
SELECT word, round(max(pow(COALESCE(obs, 0) - expd, 2) / expd) + 1e-9, 3) + 0.0 AS chi2
FROM (
  SELECT w.word, p.obs, c.n_c / t.n_samples * w.tot_w AS expd
  FROM per_w w CROSS JOIN per_c c CROSS JOIN tot t
  LEFT JOIN per_cw p ON p.word = w.word AND p.label = c.label
)
GROUP BY word"""

ORACLES["q_anova_f"] = f"""WITH {_coef_ctes()},
g AS (
  SELECT seg, CAST(series_id % {N_LABELS} AS BIGINT) AS label,
         sum(coef) AS s, sum(coef * coef) AS ss, CAST(count(*) AS DOUBLE) AS m
  FROM paa GROUP BY seg, 2
),
t AS (
  SELECT seg, sum(s) AS sv, sum(ss) AS ssv, sum(m) AS nv,
         CAST(count(*) AS DOUBLE) AS k, sum(s * s / m) AS sq_over_m
  FROM g GROUP BY seg
),
f AS (
  SELECT seg,
         CASE WHEN abs((ssv - sq_over_m) / (nv - k)) < 1e-12 THEN 0.0
              ELSE ((sq_over_m - sv * sv / nv) / (k - 1)) /
                   ((ssv - sq_over_m) / (nv - k)) END AS f_stat
  FROM t
)
SELECT seg, round(f_stat + 1e-9, 3) + 0.0 AS f_stat,
       CAST(row_number() OVER (ORDER BY f_stat DESC, seg ASC) AS INT) AS rank
FROM f QUALIFY rank <= {L}"""


def _tfidf_sql(bag_cte: str, train_only: bool) -> str:
    flt = f"WHERE series_id % {TEST_MOD} <> 0" if train_only else ""
    return f"""ct AS (
  SELECT CAST(series_id % {N_LABELS} AS BIGINT) AS label, word,
         CAST(sum(cnt) AS DOUBLE) AS tf
  FROM {bag_cte} {flt} GROUP BY 1, word
),
dfreq AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM ct GROUP BY word),
ncls AS (SELECT CAST(count(DISTINCT label) AS DOUBLE) AS c FROM ct),
raw AS (
  SELECT label, word,
         CASE WHEN df >= c THEN 0.0
              ELSE (1.0 + log10(tf)) / log10(1.0 + c / df) END AS weight
  FROM ct JOIN dfreq USING (word) CROSS JOIN ncls
),
tfidf AS (
  SELECT label, word,
         CASE WHEN nrm < 1e-12 THEN 0.0 ELSE weight / nrm END AS weight
  FROM (
    SELECT label, word, weight,
           sqrt(sum(weight * weight) OVER (PARTITION BY label)) AS nrm
    FROM raw
  )
)"""


ORACLES["q_tfidf_fit"] = f"""WITH {_bag_ctes()},
{_tfidf_sql('bag', train_only=False)}
SELECT label, word, round(weight + 1e-9, 4) + 0.0 AS weight FROM tfidf"""

_PREDICT_TAIL = f"""scored AS (
  SELECT b.series_id, t.label, sum(b.cnt * t.weight) AS score
  FROM bag b JOIN tfidf t USING (word)
  WHERE b.series_id % {TEST_MOD} = 0
  GROUP BY b.series_id, t.label
),
pred AS (
  SELECT series_id, label AS pred_label, score
  FROM scored
  QUALIFY row_number() OVER (PARTITION BY series_id ORDER BY score DESC, label ASC) = 1
)"""

ORACLES["q_tfidf_predict"] = f"""WITH {_bag_ctes()},
{_tfidf_sql('bag', train_only=True)},
{_PREDICT_TAIL}
SELECT series_id, CAST(pred_label AS BIGINT) AS pred_label FROM pred"""

ORACLES["q_tfidf_accuracy"] = f"""WITH {_bag_ctes()},
{_tfidf_sql('bag', train_only=True)},
{_PREDICT_TAIL}
SELECT round(avg(CASE WHEN pred_label = series_id % {N_LABELS} THEN 1.0 ELSE 0.0 END), 3) AS acc,
       CAST(count(*) AS BIGINT) AS n
FROM pred"""

ORACLES["q_boss_1nn"] = f"""WITH {_bag_ctes()},
test AS (SELECT * FROM bag WHERE series_id % {TEST_MOD} = 0),
train AS (SELECT * FROM bag WHERE series_id % {TEST_MOD} <> 0),
sumsq AS (
  SELECT series_id AS q_id, CAST(sum(cnt * cnt) AS BIGINT) AS ssq
  FROM test GROUP BY series_id
),
corr AS (
  SELECT t.series_id AS q_id, c.series_id AS c_id,
         CAST(sum(c.cnt * c.cnt - 2 * t.cnt * c.cnt) AS BIGINT) AS corr
  FROM test t JOIN train c USING (word)
  GROUP BY 1, 2
),
pairs AS (
  -- reference acceptance (BOSSEnsembleClassifier.java:216): neighbor
  -- needs dist != sumsq (corr != 0) and dist > 0 — zero-overlap
  -- candidates never win, so only word-join pairs are scanned
  SELECT k.q_id, k.c_id, CAST(s.ssq + k.corr AS BIGINT) AS dist
  FROM corr k JOIN sumsq s USING (q_id)
  WHERE k.corr <> 0 AND s.ssq + k.corr > 0
)
SELECT q_id AS series_id, c_id AS nn_id, dist
FROM pairs
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, c_id ASC) = 1"""

ORACLES["q_folds"] = f"""WITH {SERIES},
labeled AS (
  SELECT DISTINCT series_id, CAST(series_id % {N_LABELS} AS BIGINT) AS label FROM series
),
f AS (
  SELECT label,
         CAST((row_number() OVER (PARTITION BY label ORDER BY series_id) - 1) % 10 AS INT) AS fold
  FROM labeled
)
SELECT label, fold, CAST(count(*) AS BIGINT) AS cnt FROM f GROUP BY label, fold"""

ORACLES["q_tpch_pricing"] = """SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus"""

ORACLES["q_top_customers"] = """WITH rev AS (
  SELECT c_custkey, c_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name
)
SELECT c_custkey, c_name, revenue,
       CAST(row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS INT) AS rk
FROM rev QUALIFY rk <= 10"""

ORACLES["q_sfa_words_equidepth"] = f"""WITH {_coef_ctes()},
sym AS (
  SELECT series_id, win, seg,
         CAST(ntile({A}) OVER (PARTITION BY seg ORDER BY coef, series_id, win) - 1 AS INT) AS symbol
  FROM paa
),
words AS (
  SELECT series_id, win,
         CAST(sum(CAST(symbol AS BIGINT) << (2 * seg)) AS BIGINT) AS word
  FROM sym GROUP BY series_id, win
),
nr AS (
  SELECT series_id, win, word,
         lag(word) OVER (PARTITION BY series_id ORDER BY win) AS prev
  FROM words
)
SELECT series_id, word, CAST(count(*) AS BIGINT) AS cnt
FROM nr WHERE prev IS NULL OR word <> prev
GROUP BY series_id, word"""

ORACLES["q_derivatives"] = f"""WITH {SERIES},
mv AS (
  SELECT series_id, 0 AS dim, pos, value FROM series
  UNION ALL
  SELECT series_id, 1 AS dim, pos, abs(nxt - value) AS value FROM (
    SELECT series_id, pos, value,
           lead(value) OVER (PARTITION BY series_id ORDER BY pos) AS nxt
    FROM series
  ) WHERE nxt IS NOT NULL
)
SELECT series_id, CAST(dim AS INT) AS dim,
       CAST(count(*) AS BIGINT) AS n_points,
       round(sum(value) + 1e-9, 2) + 0.0 AS sum_value
FROM mv GROUP BY series_id, dim"""

ORACLES["q_pla_segments"] = f"""WITH {SERIES},
d AS (
  SELECT series_id,
         CASE WHEN pos * 2 < n THEN 0 ELSE 1 END AS seg,
         CAST(pos - CASE WHEN pos * 2 < n THEN 0
                         ELSE n // 2 END AS DOUBLE) AS x,
         value
  FROM series
),
agg AS (
  SELECT series_id, CAST(seg AS INT) AS seg,
         covar_pop(x, value) AS cxy, var_pop(x) AS vx,
         avg(x) AS mx, avg(value) AS my
  FROM d GROUP BY series_id, seg
)
SELECT series_id, seg,
       round(CASE WHEN vx < 1e-12 THEN 0.0 ELSE cxy / vx END + 1e-9, 4) + 0.0 AS slope,
       round(my - (CASE WHEN vx < 1e-12 THEN 0.0 ELSE cxy / vx END) * mx + 1e-9, 4) + 0.0 AS icept
FROM agg"""

# APCA greedy bottom-up merge mirrored EXACTLY as a recursive CTE:
# each iteration merges, per series still above K segments, the
# adjacent pair whose merge increases reconstruction error least
# (cost = err(merged) − err(a) − err(b), err = q − s·s/m — the same
# IEEE expressions, so argmin decisions agree bit-for-bit; ties break
# on lo like the Python kernel's strict <). Series at ≤K pass through;
# recursion ends when every series is merged down (gmax ≤ K). The
# greedy merge was believed non-SQL-expressible (rows-only r1-r4) —
# it is merely iterative, and iteration is what RECURSIVE gives.
_APCA_K = 4  # l=8 → l/2 pairs

ORACLES["q_apca_segments"] = f"""WITH RECURSIVE {SERIES},
segs AS (
  SELECT series_id, CAST(pos AS BIGINT) AS lo, CAST(pos + 1 AS BIGINT) AS hi,
         value AS s, value * value AS q, 0 AS it
  FROM series
  UNION ALL
  SELECT series_id, lo,
         CASE WHEN best THEN nhi ELSE hi END AS hi,
         CASE WHEN best THEN s + ns ELSE s END AS s,
         CASE WHEN best THEN q + nq ELSE q END AS q,
         it + 1 AS it
  FROM (
    SELECT *,
           (cnt > {_APCA_K} AND rnk = 1) AS best,
           coalesce(lag(cnt > {_APCA_K} AND rnk = 1)
                    OVER (PARTITION BY series_id ORDER BY lo), FALSE) AS away,
           max(cnt) OVER () AS gmax
    FROM (
      SELECT *,
             row_number() OVER (
               PARTITION BY series_id ORDER BY (cost IS NULL), cost, lo
             ) AS rnk
      FROM (
        SELECT *,
               ((q + nq) - (s + ns) * (s + ns) / (nhi - lo))
                 - (q - s * s / (hi - lo))
                 - (nq - ns * ns / (nhi - nlo)) AS cost
        FROM (
          SELECT *,
                 lead(lo) OVER w AS nlo,
                 lead(hi) OVER w AS nhi,
                 lead(s) OVER w AS ns,
                 lead(q) OVER w AS nq,
                 count(*) OVER (PARTITION BY series_id) AS cnt
          FROM segs
          WINDOW w AS (PARTITION BY series_id ORDER BY lo)
        )
      )
    )
  )
  WHERE gmax > {_APCA_K} AND NOT away
),
final AS (SELECT * FROM segs WHERE it = (SELECT max(it) FROM segs)),
ranked AS (
  SELECT series_id,
         row_number() OVER (PARTITION BY series_id ORDER BY lo) - 1 AS i,
         s / (hi - lo) AS v,
         CAST(hi - 1 AS DOUBLE) AS e
  FROM final
),
apca_pairs AS (
  SELECT series_id, CAST(2*i AS INT) AS seg, v AS coef FROM ranked
  UNION ALL
  SELECT series_id, CAST(2*i+1 AS INT) AS seg, e AS coef FROM ranked
),
allsegs AS (
  SELECT d.series_id AS series_id, gs.seg AS seg
  FROM (SELECT DISTINCT series_id FROM series) d
  CROSS JOIN (SELECT unnest(generate_series(0, {2 * _APCA_K - 1})) AS seg) gs
)
SELECT a.series_id AS series_id, CAST(a.seg AS INT) AS seg,
       round(coalesce(p.coef, 0.0) + 1e-9, 4) + 0.0 AS coef
FROM allsegs a
LEFT JOIN apca_pairs p ON p.series_id = a.series_id AND p.seg = a.seg"""

# -- spectral cross-implementation oracles: Spark uses numpy FFT, the
# -- oracle recomputes coefficients as explicit trig sums.

ORACLES["q_dft_coefs"] = f"""WITH {SERIES},
meta AS (
  SELECT series_id, CAST(pow(2, ceil(log2(max(n)))) AS BIGINT) AS nfft
  FROM series GROUP BY series_id
),
ks AS (SELECT unnest(generate_series(1, 4)) AS k),
terms AS (
  SELECT s.series_id, k.k, m.nfft,
         sum(s.value * cos(2 * pi() * k.k * s.pos / m.nfft)) AS re,
         sum(s.value * sin(2 * pi() * k.k * s.pos / m.nfft)) AS im
  FROM series s JOIN meta m USING (series_id) CROSS JOIN ks k
  GROUP BY s.series_id, k.k, m.nfft
)
SELECT series_id, CAST(2 * (k - 1) AS INT) AS seg,
       round(re / sqrt(nfft) + 1e-9, 4) + 0.0 AS coef
FROM terms
UNION ALL
SELECT series_id, CAST(2 * (k - 1) + 1 AS INT) AS seg,
       round(im / sqrt(nfft) + 1e-9, 4) + 0.0 AS coef
FROM terms"""

ORACLES["q_mft_sliding"] = f"""WITH {SERIES},
swin AS (
  SELECT series_id, pos, value, n,
         unnest(generate_series(greatest(pos - 15, 0), least(pos, n - 16))) AS win
  FROM series WHERE n >= 16
),
wstat AS (
  SELECT series_id, win, stddev_pop(value) AS sd
  FROM swin GROUP BY series_id, win
),
ks AS (SELECT unnest(generate_series(1, 2)) AS k),
terms AS (
  SELECT w.series_id, w.win, k.k,
         sum(w.value * cos(2 * pi() * k.k * (w.pos - w.win) / 16)) AS re,
         sum(w.value * sin(2 * pi() * k.k * (w.pos - w.win) / 16)) AS im
  FROM swin w CROSS JOIN ks k
  GROUP BY w.series_id, w.win, k.k
),
normed AS (
  SELECT t.series_id, t.win, t.k,
         t.re * (CASE WHEN s.sd > 0 THEN 1.0 / s.sd ELSE 1.0 END) / 4 AS re,
         t.im * (CASE WHEN s.sd > 0 THEN 1.0 / s.sd ELSE 1.0 END) / 4 AS im
  FROM terms t JOIN wstat s USING (series_id, win)
)
SELECT series_id, win, CAST(2 * (k - 1) AS INT) AS seg,
       round(re + 1e-9, 4) + 0.0 AS coef
FROM normed
UNION ALL
SELECT series_id, win, CAST(2 * (k - 1) + 1 AS INT) AS seg,
       round(im + 1e-9, 4) + 0.0 AS coef
FROM normed"""

# Full SFA pipeline (fit on DISJOINT chunks → sliding words → bags):
# every stage reuses an already-proven oracle technique — trig-sum MFT
# (q_mft_sliding), 2-dp orderline + reference equi-depth scan
# (q_equi_depth_bins), quantize = #boundaries <= coef, 2-bit pack,
# numerosity reduction + bag (q_sfa_words/_bag_ctes). Parameters match
# queries_spectral.q_sfa_words_dft: w=16, l=4 (k=1..2, norm_mean drops
# DC), alphabet 4, z-norm 1/sd, lower-bounding 1/√16; the oracle "im"
# is +Σ value·sin — the reference's negated-imaginary storage.
ORACLES["q_sfa_words_dft"] = f"""WITH {SERIES},
ks AS (SELECT unnest(generate_series(1, 2)) AS k),
chunk AS (
  SELECT series_id, CAST(floor(pos / 16) AS BIGINT) AS ci,
         pos % 16 AS poff, value
  FROM series WHERE n >= 16 AND pos < n - (n % 16)
),
cstat AS (
  SELECT series_id, ci, stddev_pop(value) AS sd FROM chunk GROUP BY 1, 2
),
cterm AS (
  SELECT c.series_id, c.ci, k.k,
         sum(c.value * cos(2 * pi() * k.k * c.poff / 16)) AS re,
         sum(c.value * sin(2 * pi() * k.k * c.poff / 16)) AS im
  FROM chunk c CROSS JOIN ks k GROUP BY 1, 2, 3
),
cnorm AS (
  SELECT t.series_id, t.ci, t.k,
         t.re * (CASE WHEN s.sd > 0 THEN 1.0 / s.sd ELSE 1.0 END) / 4 AS re,
         t.im * (CASE WHEN s.sd > 0 THEN 1.0 / s.sd ELSE 1.0 END) / 4 AS im
  FROM cterm t JOIN cstat s USING (series_id, ci)
),
orderline AS (
  SELECT CAST(2 * (k - 1) AS INT) AS seg, round(re, 2) AS coef FROM cnorm
  UNION ALL
  SELECT CAST(2 * (k - 1) + 1 AS INT) AS seg, round(im, 2) AS coef FROM cnorm
),
ranked AS (
  SELECT seg, coef, row_number() OVER (PARTITION BY seg ORDER BY coef) AS rn,
         count(*) OVER (PARTITION BY seg) AS cnt
  FROM orderline
),
b1 AS (SELECT seg, min(coef) AS b FROM ranked WHERE rn > ceil(cnt / 4.0 * 1) GROUP BY seg),
b2 AS (SELECT r.seg, min(r.coef) AS b FROM ranked r JOIN b1 USING (seg)
       WHERE r.rn > ceil(r.cnt / 4.0 * 2) AND r.coef > b1.b GROUP BY r.seg),
b3 AS (SELECT r.seg, min(r.coef) AS b FROM ranked r JOIN b2 USING (seg)
       WHERE r.rn > ceil(r.cnt / 4.0 * 3) AND r.coef > b2.b GROUP BY r.seg),
bins AS (
  SELECT DISTINCT r.seg, b1.b AS bv1, b2.b AS bv2, b3.b AS bv3
  FROM ranked r LEFT JOIN b1 USING (seg) LEFT JOIN b2 USING (seg)
       LEFT JOIN b3 USING (seg)
),
swin AS (
  SELECT series_id, pos, value, n,
         unnest(generate_series(greatest(pos - 15, 0), least(pos, n - 16))) AS win
  FROM series WHERE n >= 16
),
wstat AS (
  SELECT series_id, win, stddev_pop(value) AS sd FROM swin GROUP BY 1, 2
),
wterm AS (
  SELECT w.series_id, w.win, k.k,
         sum(w.value * cos(2 * pi() * k.k * (w.pos - w.win) / 16)) AS re,
         sum(w.value * sin(2 * pi() * k.k * (w.pos - w.win) / 16)) AS im
  FROM swin w CROSS JOIN ks k GROUP BY 1, 2, 3
),
wnorm AS (
  SELECT t.series_id, t.win, t.k,
         t.re * (CASE WHEN s.sd > 0 THEN 1.0 / s.sd ELSE 1.0 END) / 4 AS re,
         t.im * (CASE WHEN s.sd > 0 THEN 1.0 / s.sd ELSE 1.0 END) / 4 AS im
  FROM wterm t JOIN wstat s USING (series_id, win)
),
wlong AS (
  SELECT series_id, win, CAST(2 * (k - 1) AS INT) AS seg, re AS coef FROM wnorm
  UNION ALL
  SELECT series_id, win, CAST(2 * (k - 1) + 1 AS INT) AS seg, im AS coef FROM wnorm
),
sym AS (
  SELECT w.series_id, w.win, w.seg,
         (CASE WHEN w.coef >= b.bv1 THEN 1 ELSE 0 END +
          CASE WHEN w.coef >= b.bv2 THEN 1 ELSE 0 END +
          CASE WHEN w.coef >= b.bv3 THEN 1 ELSE 0 END) AS symbol
  FROM wlong w JOIN bins b USING (seg)
),
words AS (
  SELECT series_id, win,
         CAST(sum(CAST(symbol AS BIGINT) << (2 * seg)) AS BIGINT) AS word
  FROM sym GROUP BY series_id, win
),
nr AS (
  SELECT series_id, win, word,
         lag(word) OVER (PARTITION BY series_id ORDER BY win) AS prev
  FROM words
)
SELECT series_id, word, CAST(count(*) AS BIGINT) AS cnt
FROM nr WHERE prev IS NULL OR word <> prev
GROUP BY series_id, word"""

# Haar DWT (T10) as closed-form block sums: after zero-padding to
# n2 = 2^L, output seg 0 is Σx/√n2 and seg ≥ 1 (coarse→fine detail
# order, functions/representations.py dwt_values) is
# (Σ first half − Σ second half)/√blk over block bi of size
# blk = n2 / 2^⌊log2 seg⌋ — a LEFT join keeps blocks that lie entirely
# in the zero padding (coef 0).
ORACLES["q_dwt_coefs"] = f"""WITH {SERIES},
meta AS (
  SELECT series_id,
         CAST(pow(2, ceil(log2(CAST(greatest(max(n), 1) AS DOUBLE)))) AS BIGINT) AS n2
  FROM series GROUP BY series_id
),
segs AS (
  SELECT series_id, n2, seg,
         CASE WHEN seg = 0 THEN n2
              ELSE n2 // CAST(pow(2, floor(log2(CAST(seg AS DOUBLE)))) AS BIGINT)
         END AS blk,
         CASE WHEN seg = 0 THEN 0
              ELSE seg - CAST(pow(2, floor(log2(CAST(seg AS DOUBLE)))) AS BIGINT)
         END AS bi
  FROM (
    SELECT series_id, n2, unnest(generate_series(0, least(7, n2 - 1))) AS seg
    FROM meta
  )
),
terms AS (
  SELECT g.series_id, g.seg,
         coalesce(sum(CASE WHEN g.seg = 0 THEN s.value
                           WHEN (s.pos % g.blk) * 2 < g.blk THEN s.value
                           ELSE -s.value END), 0.0)
         / sqrt(CAST(g.blk AS DOUBLE)) AS coef
  FROM segs g LEFT JOIN series s
    ON s.series_id = g.series_id
   AND (g.seg = 0 OR s.pos // g.blk = g.bi)
  GROUP BY g.series_id, g.seg, g.blk
)
SELECT series_id, CAST(seg AS INT) AS seg,
       round(coef + 1e-9, 4) + 0.0 AS coef
FROM terms"""

ORACLES["q_daily_revenue"] = """WITH d AS (
  SELECT CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS day,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
         CAST(count(*) AS BIGINT) AS n_items
  FROM lineitem GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day, revenue, n_items,
       CAST(row_number() OVER (ORDER BY revenue DESC, day ASC) AS INT) AS rk
FROM d QUALIFY rk <= 10"""

ORACLES["q_revenue_by_nation"] = """SELECT n_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""

ORACLES["q_stream_window_stats"] = """WITH b AS (
  SELECT user_id AS series_id,
         (epoch_ns(ts) // 600000000000) * 600 AS w_start,
         value
  FROM events
)
SELECT series_id, CAST(w_start AS BIGINT) AS w_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(avg(value) + 1e-9, 4) + 0.0 AS mean,
       round(stddev_pop(value) + 1e-9, 4) + 0.0 AS std
FROM b GROUP BY series_id, w_start"""

ORACLES["q_sessionize"] = """WITH g AS (
  SELECT user_id, ts, event_id, value,
         epoch_ns(ts) -
         epoch_ns(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
  FROM events
),
s AS (
  SELECT user_id, value,
         CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT CAST(user_id AS BIGINT) AS series_id, session_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY 1, 2"""


# as-of join: DuckDB's native ASOF LEFT JOIN is the spec; the Spark
# side computes the identical relation with the union-sort-fill plan
ORACLES["q_asof_join"] = """WITH p AS (
  SELECT event_id, user_id, epoch_ns(ts) AS ts_ns, value
  FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT user_id, epoch_ns(ts) AS ts_ns,
         arg_max(value, event_id) AS err_value
  FROM events WHERE event_type = 'error'
  GROUP BY user_id, epoch_ns(ts)
)
SELECT p.event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       p.ts_ns,
       p.value,
       e.err_value,
       p.ts_ns - e.ts_ns AS lag_ns
FROM p ASOF LEFT JOIN e ON p.user_id = e.user_id AND p.ts_ns >= e.ts_ns"""


# interval join: the oracle affords the naive BETWEEN join at gate
# scale; the Spark side bucketizes (equi-join + residual filter)
ORACLES["q_interval_join"] = """WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_ns(ts) AS ts_ns, value
  FROM events WHERE event_type = 'purchase'
),
i AS (
  SELECT event_id AS incident_id, user_id,
         epoch_ns(ts) - 3600000000000 AS w_start,
         epoch_ns(ts) + 3600000000000 AS w_end
  FROM events WHERE event_type = 'error'
)
SELECT p.purchase_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       p.ts_ns, p.value, i.incident_id, i.w_start, i.w_end
FROM p JOIN i ON p.user_id = i.user_id
              AND p.ts_ns BETWEEN i.w_start AND i.w_end"""


# funnel: the greedy earliest-completion chain is three dependent
# per-user minima — the oracle states it as chained CTEs
ORACLES["q_funnel"] = """WITH s0 AS (
  SELECT user_id, min(epoch_ns(ts)) AS r FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s1 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS r
  FROM events e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND epoch_ns(e.ts) >= s0.r
  GROUP BY e.user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_ns(e.ts)) AS r
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND epoch_ns(e.ts) >= s1.r
  GROUP BY e.user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id, 1 AS stage, r AS step_ts_ns FROM s0
UNION ALL
SELECT CAST(user_id AS BIGINT), 2, r FROM s1
UNION ALL
SELECT CAST(user_id AS BIGINT), 3, r FROM s2"""

# retention: ns-exact day bucketing mirrors the Spark floor-div
ORACLES["q_retention"] = """WITH act AS (
  SELECT DISTINCT user_id,
         epoch_ns(ts) // 86400000000000 AS p
  FROM events
),
c AS (
  SELECT user_id, p, min(p) OVER (PARTITION BY user_id) AS cohort
  FROM act
)
SELECT CAST(cohort AS BIGINT) AS cohort,
       CAST(p - cohort AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_active
FROM c GROUP BY 1, 2"""

ORACLES["q_latency_quantiles"] = """SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5) + 1e-9, 4) + 0.0 AS p50,
       round(quantile_cont(value, 0.9) + 1e-9, 4) + 0.0 AS p90,
       round(quantile_cont(value, 0.99) + 1e-9, 4) + 0.0 AS p99
FROM events GROUP BY 1"""

ORACLES["q_value_outliers"] = """WITH s AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - s.mu) / s.sd + 1e-9, 4) + 0.0 AS zscore
FROM events e JOIN s USING (event_type)
WHERE s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 3"""

# streaming session_window: same islands method as q_sessionize but at
# the µs precision of event_time (ts // 1000); same-instant ties give
# gap 0 < 30 min so the lag order within a tie cannot split a session.
# session end = last event + gap. Session windows [t, t+gap] merge on
# INCLUSIVE overlap (verified by test_stream_sessionize_matches_batch_
# islands): an event exactly gap after the last still extends the
# session, so a new island needs gap STRICTLY > 30 min — note this
# differs from the batch q_sessionize convention (gap > 30 min there
# too, so they agree).
ORACLES["q_stream_sessionize"] = """WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS t, value FROM events
),
g AS (
  SELECT user_id, t, value,
         t - lag(t) OVER (PARTITION BY user_id ORDER BY t) AS gap
  FROM e
),
s AS (
  SELECT user_id, t, value,
         CAST(sum(CASE WHEN gap IS NULL OR gap > 1800000000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS sid
  FROM g
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(min(t) AS BIGINT) AS s_start_us,
       CAST(max(t) + 1800000000 AS BIGINT) AS s_end_us,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value) + 1e-9, 4) + 0.0 AS sum_value
FROM s GROUP BY user_id, sid"""

# changelog compaction: latest row per key, (ts, event_id) ordering
ORACLES["q_latest_state"] = """WITH r AS (
  SELECT user_id, event_id, epoch_ns(ts) AS ts, event_type, value,
         count(*) OVER (PARTITION BY user_id) AS n_versions,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
)
SELECT user_id, event_id, ts, event_type,
       round(value + 1e-9, 4) + 0.0 AS value,
       CAST(n_versions AS BIGINT) AS n_versions
FROM r WHERE rk = 1"""

# stream-stream attribution join: clicks × purchases per user within a
# 6-hour horizon, at the µs resolution of event_time (ns div 1000)
ORACLES["q_stream_attribution"] = """WITH c AS (
  SELECT user_id, event_id AS click_id, epoch_ns(ts) // 1000 AS ct
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, epoch_ns(ts) // 1000 AS pt, value
  FROM events WHERE event_type = 'purchase'
)
SELECT CAST(c.user_id AS BIGINT) AS user_id,
       CAST(click_id AS BIGINT) AS click_id,
       CAST(purchase_id AS BIGINT) AS purchase_id,
       CAST(pt - ct AS BIGINT) AS gap_us,
       round(value + 1e-9, 4) + 0.0 AS value
FROM c JOIN p ON c.user_id = p.user_id
 AND pt >= ct AND pt <= ct + 21600000000"""

# salted skew join output == the plain equi-join: plain SQL oracle
ORACLES["q_salted_revenue"] = """SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       CAST(count(*) AS BIGINT) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0 AS revenue
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1"""

# TPC-H Q3 shape: pre-cutoff orders, post-cutoff shipments, top-10
ORACLES["q_tpch_shipping"] = """WITH rev AS (
  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
         round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0 AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderdate < TIMESTAMP '1998-01-01'
    AND l_shipdate > TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
)
SELECT o_orderkey, o_orderpriority, revenue,
       CAST(row_number() OVER (ORDER BY revenue DESC, o_orderkey ASC) AS INT) AS rk
FROM rev QUALIFY rk <= 10"""

# TPC-H Q5 shape: local-supplier revenue per nation
ORACLES["q_tpch_local_supplier"] = """SELECT n_name,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name"""


# q_json_props: same explicit-schema extraction (json_extract_string →
# INT), same decimal-summed conditional aggregate, same rnd() mirror
ORACLES["q_json_props"] = """WITH p AS (
  SELECT event_type, value,
         CASE WHEN json_valid(props)
              THEN TRY_CAST(json_extract_string(props, '$.k') AS INT)
              ELSE NULL END AS k
  FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
  CAST(count(DISTINCT k) AS BIGINT) AS n_k,
  round(avg(k) + 1e-9, 4) + 0.0 AS avg_k,
  CAST(sum(CASE WHEN k >= 50 THEN CAST(value AS DECIMAL(18,6))
               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS hi_value
FROM p GROUP BY event_type"""


# streaming upsert sink: incremental max_by merges are associative —
# the final state equals the batch compaction, so the oracle is shared
ORACLES["q_stream_latest_state"] = ORACLES["q_latest_state"]

# streaming TEASER accept: the keyed (label, streak) state machine —
# first snapshot where the same pred_label repeats 3 consecutive times
# — is a gaps-and-islands streak in SQL (island id = snapshot −
# row_number within (series, label); streak = row_number within island)
ORACLES["q_stream_teaser"] = """WITH p AS (
  SELECT user_id AS series_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS snapshot,
         CAST(abs(CAST(floor(value * 7) AS BIGINT)) % 3 AS DOUBLE) AS pred_label
  FROM events
),
isl AS (
  SELECT series_id, snapshot, pred_label,
         snapshot - row_number() OVER (PARTITION BY series_id, pred_label ORDER BY snapshot) AS grp
  FROM p
),
runs AS (
  SELECT series_id, snapshot, pred_label,
         row_number() OVER (PARTITION BY series_id, pred_label, grp ORDER BY snapshot) AS streak
  FROM isl
),
acc AS (
  SELECT series_id, pred_label, snapshot AS accepted_at,
         row_number() OVER (PARTITION BY series_id ORDER BY snapshot) AS rn
  FROM runs WHERE streak = 3
)
SELECT series_id, pred_label, CAST(accepted_at AS BIGINT) AS accepted_at
FROM acc WHERE rn = 1"""


# q_scd2_history: same ordered window — valid_to = next version's ts
ORACLES["q_scd2_history"] = """WITH e AS (
  SELECT user_id, event_id, event_type, value, epoch_ns(ts) AS ts
  FROM events WHERE user_id < 20
)
SELECT user_id, event_id, event_type,
  CAST(row_number() OVER w AS INT) AS version,
  ts AS valid_from,
  lead(ts) OVER w AS valid_to,
  (lead(ts) OVER w IS NULL) AS is_current,
  round(value + 1e-9, 4) + 0.0 AS value
FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)"""


# q_scd2_apply: the incremental fold must equal the from-scratch
# rebuild — same SQL as q_scd2_history.
ORACLES["q_scd2_apply"] = ORACLES["q_scd2_history"]

# q_stream_scd2: the streaming fold over time-sliced micro-batches
# must also equal the from-scratch rebuild.
ORACLES["q_stream_scd2"] = ORACLES["q_scd2_history"]


# q_rollup_revenue: identical grouping sets; DuckDB's GROUPING() bits
# are assembled in Spark's grouping_id order (n_name high bit)
ORACLES["q_rollup_revenue"] = """SELECT n_name,
  CAST(year(o_orderdate) AS INT) AS o_year,
  CAST(2 * GROUPING(n_name) + GROUPING(year(o_orderdate)) AS INT) AS gid,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
  CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, year(o_orderdate))"""


# q_corr_pricing: identical decimal-summed moments + identical closed
# form (never the engines' own corr(), whose accumulation order differs)
ORACLES["q_corr_pricing"] = """WITH m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
    CAST(sum(CAST(l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS sq,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sp,
    CAST(sum(CAST(l_discount AS DECIMAL(38,12))) AS DOUBLE) AS sd,
    CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,12))) AS DOUBLE) AS sqq,
    CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS spp,
    CAST(sum(CAST(l_discount * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS sdd,
    CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,12))) AS DOUBLE) AS sqp,
    CAST(sum(CAST(l_quantity * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS sqd,
    CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,12))) AS DOUBLE) AS spd
  FROM lineitem
)
SELECT CAST(n AS BIGINT) AS n_rows,
  round((n*sqp - sq*sp) / (sqrt(n*sqq - sq*sq) * sqrt(n*spp - sp*sp)) + 1e-9, 4) + 0.0 AS corr_qty_price,
  round((n*sqd - sq*sd) / (sqrt(n*sqq - sq*sq) * sqrt(n*sdd - sd*sd)) + 1e-9, 4) + 0.0 AS corr_qty_disc,
  round((n*spd - sp*sd) / (sqrt(n*spp - sp*sp) * sqrt(n*sdd - sd*sd)) + 1e-9, 4) + 0.0 AS corr_price_disc
FROM m"""


# q_observed_quality: the observation must report exactly what the job
# consumed — recomputed directly
ORACLES["q_observed_quality"] = """SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type,
  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value
FROM events"""


ORACLES["q_event_cooccurrence"] = """WITH ut AS (
  SELECT DISTINCT user_id, event_type FROM events
),
singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt FROM ut GROUP BY 1
),
nu AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users FROM ut),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS support
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, support,
       sa.cnt AS cnt_a, sb.cnt AS cnt_b,
       round(support * nu.n_users / (sa.cnt * sb.cnt) + 1e-9, 4) + 0.0 AS lift
FROM pairs
JOIN singles sa ON sa.event_type = type_a
JOIN singles sb ON sb.event_type = type_b
CROSS JOIN nu"""


# q_twap: identical lead(dt) intervals (ns integers) and decimal sums
ORACLES["q_twap"] = """WITH d AS (
  SELECT user_id, value,
         lead(epoch_ns(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ns(ts), event_id)
           - epoch_ns(ts) AS dt
  FROM events
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_intervals,
  round(CAST(sum(CAST(value * (dt / 1e9) AS DECIMAL(38,12))) AS DOUBLE)
        / CAST(sum(CAST(dt / 1e9 AS DECIMAL(38,12))) AS DOUBLE) + 1e-9, 4) + 0.0 AS twap
FROM d WHERE dt IS NOT NULL GROUP BY user_id"""


# q_pattern_click_purchase: the 'next purchase' composite (ts, id) min
# is encoded as a fixed-width string so its lexicographic min equals
# Spark's struct min; the error block compares plain min ts
ORACLES["q_pattern_click_purchase"] = """WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ns(ts) AS ts FROM events
),
x AS (
  SELECT user_id, event_id, event_type, ts,
    min(CASE WHEN event_type = 'purchase'
             THEN lpad(CAST(ts AS VARCHAR), 20, '0') || ':' ||
                  lpad(CAST(event_id AS VARCHAR), 12, '0') END)
      OVER w AS nxt,
    min(CASE WHEN event_type = 'error' THEN ts END) OVER w AS blk_ts
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
SELECT user_id, ts AS start_ts, event_id AS start_id,
  CAST(substr(nxt, 1, 20) AS BIGINT) AS then_ts,
  CAST(substr(nxt, 22) AS BIGINT) AS then_id
FROM x
WHERE event_type = 'click' AND nxt IS NOT NULL
  AND (blk_ts IS NULL OR blk_ts >= CAST(substr(nxt, 1, 20) AS BIGINT))"""


ORACLES["q_pivot_activity"] = """SELECT user_id,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view,
  CAST(count(*) FILTER (WHERE event_type IN
       ('click','error','purchase','signup','view')) AS BIGINT) AS n_total
FROM events GROUP BY user_id"""


# q_mad_outliers: exact medians (quantile_cont == Spark percentile)
ORACLES["q_mad_outliers"] = """WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m FROM events GROUP BY 1
),
mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - med.m), 0.5) AS mad, any_value(med.m) AS m
  FROM events e JOIN med USING (event_type) GROUP BY e.event_type
)
SELECT event_id, e.event_type, value,
       round(abs(value - mad.m) / (1.4826 * mad.mad) + 1e-9, 4) + 0.0 AS mad_score
FROM events e JOIN mad USING (event_type)
WHERE mad.mad > 0 AND abs(value - mad.m) > 3 * 1.4826 * mad.mad"""


# q_unpivot_metrics: the same decimal sums, melted via UNION ALL
ORACLES["q_unpivot_metrics"] = """WITH w AS (
  SELECT l_returnflag,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS price,
    CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS disc_price
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, metric, round(total + 1e-9, 4) + 0.0 AS total FROM (
  SELECT l_returnflag, 'qty' AS metric, qty AS total FROM w
  UNION ALL SELECT l_returnflag, 'price', price FROM w
  UNION ALL SELECT l_returnflag, 'disc_price', disc_price FROM w
)"""


ORACLES["q_value_histogram"] = """WITH r AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
)
SELECT event_type,
  CAST(least(15, floor((value - lo) / ((hi - lo) / 16.0))) AS INT) AS bucket,
  CAST(count(*) AS BIGINT) AS cnt
FROM events CROSS JOIN r
GROUP BY 1, 2"""


# q_snapshot_diff: IS DISTINCT FROM mirrors Spark's ~eqNullSafe on the
# compare struct; the slice predicates are replayed verbatim.
ORACLES["q_snapshot_diff"] = """WITH old AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 89 = 7 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice,
         o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 3
), new AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 101 <> 5
)
SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'added'
            WHEN n.o_orderkey IS NULL THEN 'removed'
            WHEN (o.o_orderstatus    IS DISTINCT FROM n.o_orderstatus)
              OR (o.o_totalprice     IS DISTINCT FROM n.o_totalprice)
              OR (o.o_orderpriority  IS DISTINCT FROM n.o_orderpriority)
            THEN 'changed' END AS status
FROM old o FULL OUTER JOIN new n USING (o_orderkey)
WHERE CASE WHEN o.o_orderkey IS NULL THEN 'added'
           WHEN n.o_orderkey IS NULL THEN 'removed'
           WHEN (o.o_orderstatus    IS DISTINCT FROM n.o_orderstatus)
             OR (o.o_totalprice     IS DISTINCT FROM n.o_totalprice)
             OR (o.o_orderpriority  IS DISTINCT FROM n.o_orderpriority)
           THEN 'changed' END IS NOT NULL"""


# q_skew_profile: total order (cnt DESC, event_type ASC) matches the
# engine's ranked_top_k spec.
ORACLES["q_skew_profile"] = """WITH per_key AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
), totals AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM per_key
), ranked AS (
  SELECT event_type, cnt,
         CAST(row_number() OVER (ORDER BY cnt DESC, event_type ASC) AS INT) AS rk
  FROM per_key
)
SELECT event_type, cnt, rk, total_rows, n_keys,
       round(cnt * 1.0 / total_rows + 1e-9, 6) + 0.0 AS share,
       round(cnt * 1.0 * n_keys / total_rows + 1e-9, 6) + 0.0 AS skew_ratio
FROM ranked CROSS JOIN totals
WHERE rk <= 10"""


# q_merge_changes: the same synthesized batch, collapsed per key by
# max (seq, op) (arg_max over a composite), applied with MERGE
# semantics via full-outer join.
ORACLES["q_merge_changes"] = """WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
), changes AS (
  SELECT o_orderkey, CAST(1 AS BIGINT) AS seq, 'U' AS op,
         'U1' AS c_status, o_totalprice + 100.0 AS c_price
  FROM base WHERE o_orderkey % 7 = 1
  UNION ALL
  SELECT o_orderkey, 2, 'D', NULL, NULL
  FROM base WHERE o_orderkey % 13 = 2
  UNION ALL
  SELECT o_orderkey, 3, 'U', 'U2', o_totalprice + 200.0
  FROM base WHERE o_orderkey % 21 = 15
  UNION ALL
  SELECT o_orderkey + 10000000, 1, 'U', 'NEW', 1.0
  FROM base WHERE o_orderkey % 97 = 0
), latest AS (
  -- composite (seq, op) max via fixed-width string key (same trick as
  -- the q_pattern_click_purchase oracle): lpad(seq)||op sorts exactly
  -- like Spark's struct(seq, op)
  SELECT o_orderkey,
         arg_max(op, lpad(CAST(seq AS VARCHAR), 20, '0') || op) AS op,
         arg_max(c_status, lpad(CAST(seq AS VARCHAR), 20, '0') || op) AS c_status,
         arg_max(c_price, lpad(CAST(seq AS VARCHAR), 20, '0') || op) AS c_price
  FROM changes GROUP BY 1
)
SELECT coalesce(b.o_orderkey, l.o_orderkey) AS o_orderkey,
       CASE WHEN l.op = 'U' THEN l.c_status ELSE b.o_orderstatus END AS o_orderstatus,
       round(CASE WHEN l.op = 'U' THEN l.c_price ELSE b.o_totalprice END + 1e-9, 4) + 0.0 AS o_totalprice
FROM base b FULL OUTER JOIN latest l USING (o_orderkey)
WHERE l.op IS NULL OR l.op <> 'D'"""


# q_column_profile: same single-pass profile, exact distincts.
ORACLES["q_column_profile"] = """SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value,
  round(min(value) + 1e-9, 6) + 0.0 AS min_value,
  round(max(value) + 1e-9, 6) + 0.0 AS max_value,
  CAST(count(DISTINCT event_type) AS BIGINT) AS nd_event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS nd_user_id,
  min(event_type) AS min_event_type,
  max(event_type) AS max_event_type
FROM events"""


# q_drift_psi: same combined-range equi-width buckets, shares floored
# at 1e-6, natural-log PSI terms.
ORACLES["q_drift_psi"] = """WITH u AS (
  SELECT value AS v, 0 AS side FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT value * 1.25 + 0.5, 1 FROM events WHERE event_id % 2 = 1
), u2 AS (
  SELECT v, side FROM u WHERE v IS NOT NULL
), r AS (
  SELECT min(v) AS lo, max(v) AS hi FROM u2
), b AS (
  SELECT CASE WHEN hi = lo THEN 0
              ELSE CAST(least(9, floor((v - lo) / ((hi - lo) / 10.0))) AS INT)
         END AS bucket, side
  FROM u2 CROSS JOIN r
), counts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM b GROUP BY 1
), totals AS (
  SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
         CAST(sum(n_new) AS BIGINT) AS t_new
  FROM counts
)
SELECT bucket, n_old, n_new,
       round(greatest(n_old * 1.0 / t_old, 1e-6) + 1e-9, 6) + 0.0 AS share_old,
       round(greatest(n_new * 1.0 / t_new, 1e-6) + 1e-9, 6) + 0.0 AS share_new,
       round((greatest(n_new * 1.0 / t_new, 1e-6) - greatest(n_old * 1.0 / t_old, 1e-6))
             * ln(greatest(n_new * 1.0 / t_new, 1e-6) / greatest(n_old * 1.0 / t_old, 1e-6))
             + 1e-9, 6) + 0.0 AS psi_term
FROM counts CROSS JOIN totals"""


# q_drift_psi_quantile: decile edges of the OLD side via quantile_cont
# (== Spark percentile, certified bridge), rounded to 6 dp on both
# engines; bucket = number of edges strictly below v.
ORACLES["q_drift_psi_quantile"] = """WITH o AS (
  SELECT value AS v FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
), e AS (
  SELECT list_transform(
           quantile_cont(v, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
           x -> round(x, 6)) AS edges
  FROM o
), u AS (
  SELECT value AS v, 0 AS side FROM events WHERE event_id % 2 = 0
  UNION ALL
  SELECT value * 1.25 + 0.5, 1 FROM events WHERE event_id % 2 = 1
), b AS (
  SELECT CAST(len(list_filter(edges, x -> v > x)) AS INT) AS bucket, side
  FROM (SELECT v, side FROM u WHERE v IS NOT NULL) CROSS JOIN e
), counts AS (
  SELECT bucket,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_new
  FROM b GROUP BY 1
), totals AS (
  SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
         CAST(sum(n_new) AS BIGINT) AS t_new
  FROM counts
)
SELECT bucket, n_old, n_new,
       round(greatest(n_old * 1.0 / t_old, 1e-6) + 1e-9, 6) + 0.0 AS share_old,
       round(greatest(n_new * 1.0 / t_new, 1e-6) + 1e-9, 6) + 0.0 AS share_new,
       round((greatest(n_new * 1.0 / t_new, 1e-6) - greatest(n_old * 1.0 / t_old, 1e-6))
             * ln(greatest(n_new * 1.0 / t_new, 1e-6) / greatest(n_old * 1.0 / t_old, 1e-6))
             + 1e-9, 6) + 0.0 AS psi_term
FROM counts CROSS JOIN totals"""


# q_stream_drift: bucket counts are a monoid, so the streaming result
# equals this plain SQL — reference boundaries frozen from the even
# side, stream values clamped into edge buckets.
ORACLES["q_stream_drift"] = """WITH ref AS (
  SELECT value AS v FROM events
  WHERE event_id % 2 = 0 AND value IS NOT NULL
), r AS (
  SELECT min(v) AS lo, max(v) AS hi FROM ref
), ref_b AS (
  SELECT greatest(0, least(9,
           CAST(floor((v - lo) / ((hi - lo) / 10.0)) AS INT))) AS bucket
  FROM ref CROSS JOIN r
), new_b AS (
  SELECT greatest(0, least(9,
           CAST(floor((value * 1.25 + 0.5 - lo) / ((hi - lo) / 10.0)) AS INT))) AS bucket
  FROM events CROSS JOIN r
  WHERE event_id % 2 = 1 AND value IS NOT NULL
), oc AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_old FROM ref_b GROUP BY 1
), nc AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_new FROM new_b GROUP BY 1
), j AS (
  SELECT coalesce(oc.bucket, nc.bucket) AS bucket,
         CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
         CAST(coalesce(n_new, 0) AS BIGINT) AS n_new
  FROM oc FULL OUTER JOIN nc USING (bucket)
), totals AS (
  SELECT CAST(sum(n_old) AS BIGINT) AS t_old,
         CAST(sum(n_new) AS BIGINT) AS t_new FROM j
)
SELECT bucket, n_old, n_new,
       round(greatest(n_old * 1.0 / t_old, 1e-6) + 1e-9, 6) + 0.0 AS share_old,
       round(greatest(n_new * 1.0 / t_new, 1e-6) + 1e-9, 6) + 0.0 AS share_new,
       round((greatest(n_new * 1.0 / t_new, 1e-6) - greatest(n_old * 1.0 / t_old, 1e-6))
             * ln(greatest(n_new * 1.0 / t_new, 1e-6) / greatest(n_old * 1.0 / t_old, 1e-6))
             + 1e-9, 6) + 0.0 AS psi_term
FROM j CROSS JOIN totals"""


# q_tpch_market_share: identical decimal-summed conditional numerator.
ORACLES["q_tpch_market_share"] = """WITH j AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS rev,
         (n_name = 'NATION_3') AS is_target
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
), agg AS (
  SELECT o_year,
    CAST(sum(CAST(CASE WHEN is_target THEN rev ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE) AS nation_rev,
    CAST(sum(CAST(rev AS DECIMAL(18,6))) AS DOUBLE) AS total_rev
  FROM j GROUP BY 1
)
SELECT o_year,
       round(nation_rev + 1e-9, 4) + 0.0 AS nation_rev,
       round(total_rev + 1e-9, 4) + 0.0 AS total_rev,
       round(nation_rev / total_rev + 1e-9, 6) + 0.0 AS mkt_share
FROM agg"""


# q_event_transitions: same lag pairs and conditional shares.
ORACLES["q_event_transitions"] = """WITH l AS (
  SELECT user_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), pairs AS (
  SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS cnt
  FROM l WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), totals AS (
  SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS prev_cnt
  FROM pairs GROUP BY 1
)
SELECT p.prev_type, p.next_type, p.cnt,
       round(p.cnt * 1.0 / t.prev_cnt + 1e-9, 6) + 0.0 AS p_next
FROM pairs p JOIN totals t USING (prev_type)"""


# q_winsorize: quantile_cont == Spark percentile (certified bridge).
ORACLES["q_winsorize"] = """WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.01) AS q_lo,
         quantile_cont(value, 0.99) AS q_hi
  FROM events GROUP BY 1
)
SELECT event_id, e.event_type,
       CASE WHEN value IS NULL THEN NULL
            ELSE round(least(greatest(value, q_lo), q_hi) + 1e-9, 4) + 0.0
       END AS value_w,
       CAST(CASE WHEN value IS NULL THEN NULL
                 WHEN value <> least(greatest(value, q_lo), q_hi)
                 THEN 1 ELSE 0 END AS BIGINT) AS clipped
FROM events e JOIN q USING (event_type)"""


# q_incremental_agg: full recompute — a hash match proves the
# incremental merge equals the from-scratch aggregate.
ORACLES["q_incremental_agg"] = """SELECT event_type, user_id,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0 AS total_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2"""


# q_debounce: same lag rule at ns precision.
ORACLES["q_debounce"] = """WITH l AS (
  SELECT event_id, user_id, event_type, ts,
         epoch_ns(ts) - epoch_ns(lag(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gap
  FROM events
)
SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts
FROM l WHERE gap IS NULL OR gap > 3600000000000"""


# q_rfm_segments: exact quartile boundaries (quantile_cont), same
# strictly-greater scoring ladder.
ORACLES["q_rfm_segments"] = """WITH per_user AS (
  SELECT user_id,
         epoch_ns(max(ts)) AS last_ts,
         CAST(count(*) AS BIGINT) AS freq,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS monetary
  FROM events GROUP BY 1
), b AS (
  SELECT quantile_cont(last_ts, 0.25) AS last_ts_q1,
         quantile_cont(last_ts, 0.5) AS last_ts_q2,
         quantile_cont(last_ts, 0.75) AS last_ts_q3,
         quantile_cont(freq, 0.25) AS freq_q1,
         quantile_cont(freq, 0.5) AS freq_q2,
         quantile_cont(freq, 0.75) AS freq_q3,
         quantile_cont(monetary, 0.25) AS monetary_q1,
         quantile_cont(monetary, 0.5) AS monetary_q2,
         quantile_cont(monetary, 0.75) AS monetary_q3
  FROM per_user
)
SELECT user_id, freq,
       round(monetary + 1e-9, 4) + 0.0 AS monetary,
       CAST(1 + (last_ts > last_ts_q1)::INT + (last_ts > last_ts_q2)::INT + (last_ts > last_ts_q3)::INT AS INT) AS r_score,
       CAST(1 + (freq > freq_q1)::INT + (freq > freq_q2)::INT + (freq > freq_q3)::INT AS INT) AS f_score,
       CAST(1 + (monetary > monetary_q1)::INT + (monetary > monetary_q2)::INT + (monetary > monetary_q3)::INT AS INT) AS m_score
FROM per_user CROSS JOIN b"""


# q_stream_debounce: greedy keep-anchored selection replayed exactly
# with a recursive CTE — iteration k's working table is the k-th KEPT
# event per (user, type); the aggregate picks each key's next survivor.
ORACLES["q_stream_debounce"] = """WITH RECURSIVE n AS (
  SELECT event_id, user_id, event_type, epoch_ns(ts) AS ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
), r AS (
  SELECT event_id, user_id, event_type, ts, rn FROM n WHERE rn = 1
  UNION ALL
  SELECT min_by(n2.event_id, n2.rn), n2.user_id, n2.event_type,
         min_by(n2.ts, n2.rn), min(n2.rn)
  FROM r JOIN n n2
    ON n2.user_id = r.user_id AND n2.event_type = r.event_type
   AND n2.ts > r.ts + 3600000000000
  GROUP BY n2.user_id, n2.event_type
)
SELECT event_id, user_id, event_type, ts FROM r"""


# q_tpch_order_priority: EXISTS == the left-semi shape.
ORACLES["q_tpch_order_priority"] = """SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY 1"""


# q_tpch_returned_revenue: same decimal-summed per-nation report.
ORACLES["q_tpch_returned_revenue"] = """SELECT n_name,
  round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0 AS lost_revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY 1"""


# q_quantile_sketch: exact quantiles via quantile_cont (== Spark
# percentile, certified bridge); the GK sketch's rank-error invariant
# must hash as constant TRUE.
ORACLES["q_quantile_sketch"] = """SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5) + 1e-9, 4) + 0.0 AS exact_p50,
       round(quantile_cont(value, 0.95) + 1e-9, 4) + 0.0 AS exact_p95,
       round(quantile_cont(value, 0.99) + 1e-9, 4) + 0.0 AS exact_p99,
       TRUE AS sketch_ok
FROM events WHERE value IS NOT NULL
GROUP BY 1"""


# q_tpch_shipmode_priority: Q12-shaped conditional counts.
ORACLES["q_tpch_shipmode_priority"] = """SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY 1"""


# q_tpch_big_orders: Q18-shaped HAVING pre-aggregation.
ORACLES["q_tpch_big_orders"] = """WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY 1
  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) > 100.0
)
SELECT c_name, o_orderkey,
       round(o_totalprice + 1e-9, 4) + 0.0 AS o_totalprice,
       round(total_qty + 1e-9, 4) + 0.0 AS total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey"""


# q_tpch_supplier_variety: Q16-shaped anti-join + count distinct.
ORACLES["q_tpch_supplier_variety"] = """SELECT p_brand,
       CAST(p_size % 5 AS INT) AS size_class,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2"""


# q_tpch_small_qty: Q17-shaped decorrelated per-part average (r7).
ORACLES["q_tpch_small_qty"] = """WITH pavg AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) AS avg_qty
  FROM lineitem GROUP BY 1
)
SELECT p_brand,
       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0 + 1e-9, 4) + 0.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN pavg USING (l_partkey)
WHERE p_size <= 10 AND l_quantity < 0.5 * avg_qty
GROUP BY 1"""


# q_tpch_waiting_supplier: Q21-shaped EXISTS/NOT-EXISTS pair (r7).
ORACLES["q_tpch_waiting_supplier"] = """WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         l_shipdate > o_orderdate + INTERVAL 90 DAY AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), so AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lines
), late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lines WHERE late
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM so l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
) AND NOT EXISTS (
    SELECT 1 FROM late l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
)
GROUP BY 1"""


# q_tpch_sales_opportunity: Q22-shaped anti join + scalar subquery (r7).
ORACLES["q_tpch_sales_opportunity"] = """WITH ab AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE)
             + 1e-9, 4) + 0.0 AS totacctbal
FROM customer CROSS JOIN ab
JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > avg_bal
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
GROUP BY 1"""


# q_tpch_top_supplier: Q15-shaped scalar-max selection (r7).
ORACLES["q_tpch_top_supplier"] = """WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                       AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1996-01-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       round(total_revenue + 1e-9, 4) + 0.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)"""


# q_tpch_forecast_revenue: Q6-shaped single-scan pushdown sum (r7).
ORACLES["q_tpch_forecast_revenue"] = """SELECT
  round(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
             AS DOUBLE) + 1e-9, 4) + 0.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24.0"""


# q_tpch_volume_shipping: Q7-shaped bilateral nation-pair revenue (r7).
ORACLES["q_tpch_volume_shipping"] = """WITH sn AS (
  SELECT s_suppkey, n_name AS supp_nation
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
), cn AS (
  SELECT c_custkey, n_name AS cust_nation
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
)
SELECT supp_nation, cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0
         AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN sn ON l_suppkey = s_suppkey
JOIN cn ON o_custkey = c_custkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND supp_nation <> cust_nation
GROUP BY 1, 2, 3"""


# q_tpch_product_profit: Q9-shaped profit (retail-price cost stand-in,
# r7) — the per-row amount is IEEE-double per row on both engines, so
# the decimal cast sees identical values; only the sum is decimal.
ORACLES["q_tpch_product_profit"] = """SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                           - 0.1 * p_retailprice * l_quantity
                           AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2"""


# q_tpch_customer_distribution: Q13-shaped left-join double agg (r7).
ORACLES["q_tpch_customer_distribution"] = """WITH per_cust AS (
  SELECT o_custkey, count(*) AS k
  FROM orders WHERE o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT CAST(coalesce(k, 0) AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY 1"""


# q_tpch_promo_effect: Q14-shaped conditional-aggregate ratio (r7).
ORACLES["q_tpch_promo_effect"] = """SELECT
  round(100.0
        * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                             THEN l_extendedprice * (1.0 - l_discount)
                             ELSE 0.0 END AS DECIMAL(18,6))) AS DOUBLE)
        / CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                        AS DECIMAL(18,6))) AS DOUBLE)
        + 1e-9, 4) + 0.0 AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'"""


# q_tpch_discounted_brands: Q19-shaped disjunctive predicates (r7).
ORACLES["q_tpch_discounted_brands"] = """SELECT p_brand,
       round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                           AS DECIMAL(18,6))) AS DOUBLE) + 1e-9, 4) + 0.0
         AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1.0 AND 11.0
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10.0 AND 20.0
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20.0 AND 30.0
       AND p_size BETWEEN 1 AND 15)
GROUP BY 1"""


# Shared derived-partsupp CTE for the Q2/Q11/Q20 shapes (r7): one row
# per observed (partkey, suppkey) pair with exact shipped qty and
# key-derived cost/stock — pure integer arithmetic, engine-identical.
_PS = """ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           AS ps_shipped_qty,
         CAST((l_partkey * 37 + l_suppkey * 17) % 1000 AS DOUBLE) / 100.0
           + 1.0 AS ps_supplycost,
         CAST((l_partkey * 31 + l_suppkey * 7) % 50 + 1 AS BIGINT)
           AS ps_availqty
  FROM lineitem GROUP BY 1, 2
)"""


# q_tpch_min_cost_supplier: Q2-shaped decorrelated MIN-per-part (r7).
ORACLES["q_tpch_min_cost_supplier"] = f"""WITH {_PS},
eu AS (
  SELECT s_suppkey, s_name, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
pse AS (
  SELECT ps.*, eu.s_name, eu.n_name
  FROM ps JOIN eu ON ps_suppkey = s_suppkey
),
minc AS (
  SELECT ps_partkey, min(ps_supplycost) AS min_cost FROM pse GROUP BY 1
)
SELECT ps_partkey, p_brand, s_name, n_name,
       round(ps_supplycost + 1e-9, 4) + 0.0 AS supplycost
FROM pse
JOIN minc USING (ps_partkey)
JOIN part ON ps_partkey = p_partkey
WHERE ps_supplycost = min_cost AND p_type = 'LARGE'"""


# q_tpch_important_stock: Q11-shaped share-of-global HAVING (r7).
ORACLES["q_tpch_important_stock"] = f"""WITH {_PS},
asia AS (
  SELECT s_suppkey FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
),
val AS (
  SELECT ps_partkey,
         CAST(sum(CAST(ps_supplycost * ps_availqty AS DECIMAL(18,6)))
              AS DOUBLE) AS value
  FROM ps
  WHERE ps_suppkey IN (SELECT s_suppkey FROM asia)
  GROUP BY 1
),
mv AS (
  SELECT CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*)
           AS mean_value
  FROM val
)
SELECT ps_partkey, round(value + 1e-9, 4) + 0.0 AS value
FROM val CROSS JOIN mv
WHERE value > 2.0 * mean_value"""


# q_tpch_excess_stock_supplier: Q20-shaped flattened EXISTS chain (r7).
ORACLES["q_tpch_excess_stock_supplier"] = f"""WITH {_PS},
hits AS (
  SELECT ps_suppkey, CAST(count(*) AS BIGINT) AS n_excess_parts
  FROM ps
  WHERE ps_partkey IN (SELECT p_partkey FROM part
                       WHERE p_name LIKE '%red%')
    AND CAST(ps_availqty AS DOUBLE) > 0.5 * ps_shipped_qty
  GROUP BY 1
)
SELECT s_name, n_name, n_excess_parts
FROM hits
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AMERICA'"""
