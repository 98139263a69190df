"""One-off: run TEASER (WEASEL slaves + one-class SVM master) on the
reference's bundled fixtures and print acc/earliness vs the published
goldens (TEASERClassifierTest.java:14-18, S=10)."""

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from sfa_spark.session import get_spark  # noqa: E402
from sfa_spark.sources.ucr import read_ucr  # noqa: E402
from sfa_spark.ml import teaser_weasel as tw  # noqa: E402

DATA = "/root/reference/src/main/resources/datasets/univariate"
GOLD = {"CBF": (0.982, 0.64), "Coffee": (1.0, 0.47), "variable_length": (0.929, 0.39)}

spark = get_spark("trial-teaser", shuffle_partitions=8)
for name in sys.argv[1:] or ["Coffee", "CBF"]:
    t0 = time.time()
    tr = read_ucr(spark, f"{DATA}/{name}/{name}_TRAIN").cache()
    te = read_ucr(spark, f"{DATA}/{name}/{name}_TEST").cache()
    m = tw.teaser_weasel_fit(
        tr.select("series_id", "values"), tr.select("series_id", "label"),
        s_total=10,
    )
    pred = tw.teaser_weasel_predict(m, te.select("series_id", "values"))
    r = (
        pred.join(te.select("series_id", "label"), "series_id", "right")
        .agg(
            F.avg((F.col("pred_label") == F.col("label")).cast("double")),
            F.avg("earliness"),
        )
        .collect()[0]
    )
    g = GOLD.get(name, (None, None))
    print(
        f"RESULT {name}: acc={r[0]:.4f} (gold {g[0]}) "
        f"earliness={r[1]:.4f} (gold {g[1]}) v={m.threshold} "
        f"snapshots={len(m.snapshots)} wall={time.time()-t0:.1f}s",
        flush=True,
    )
