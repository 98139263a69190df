"""Oracles for the ML-layer queries. Only the Shotgun 1-NN is
SQL-expressible (window explode + min/sum aggregation); the grid/
ensemble classifiers are rows-only checks.
"""

from __future__ import annotations

from sfa_spark.oracles import SERIES

ORACLES: dict[str, str] = {}

ORACLES["q_shotgun_1nn"] = f"""WITH {SERIES},
q AS (SELECT * FROM series WHERE series_id % 5 = 0 AND n >= 32),
c AS (SELECT * FROM series WHERE series_id % 5 <> 0 AND n >= 32),
qwin AS (
  SELECT series_id AS q_id, CAST(floor(pos / 16) AS INT) AS wi,
         pos % 16 AS poff, value
  FROM q WHERE pos < n - (n % 16)
),
qz AS (
  SELECT q_id, wi, poff,
         (value - avg(value) OVER w) /
         CASE WHEN stddev_pop(value) OVER w < 1e-8 THEN 1.0
              ELSE stddev_pop(value) OVER w END AS vz
  FROM qwin WINDOW w AS (PARTITION BY q_id, wi)
),
cwin AS (
  SELECT series_id AS c_id, pos, value,
         unnest(generate_series(greatest(pos - 15, 0), least(pos, n - 16))) AS ci
  FROM c
),
cz AS (
  SELECT c_id, ci, pos - ci AS poff,
         (value - avg(value) OVER w) /
         CASE WHEN stddev_pop(value) OVER w < 1e-8 THEN 1.0
              ELSE stddev_pop(value) OVER w END AS vz
  FROM cwin WINDOW w AS (PARTITION BY c_id, ci)
),
pair AS (
  SELECT qz.q_id, cz.c_id, qz.wi, cz.ci, sum(pow(qz.vz - cz.vz, 2)) AS sq
  FROM qz JOIN cz USING (poff)
  GROUP BY 1, 2, 3, 4
),
best AS (
  SELECT q_id, c_id, wi, min(sq) AS minsq FROM pair GROUP BY 1, 2, 3
),
total AS (
  SELECT q_id, c_id, sum(minsq) AS dist FROM best GROUP BY 1, 2
)
SELECT q_id AS series_id, c_id AS nn_id,
       round(dist + 1e-9, 4) + 0.0 AS dist
FROM total
QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, c_id ASC) = 1"""
