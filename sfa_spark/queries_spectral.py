"""Spectral driver queries. The DFT/MFT oracles are CROSS-IMPLEMENTATION
checks: Spark computes via numpy (r)FFT inside a pandas UDF, DuckDB
recomputes the same coefficients as explicit trig sums — agreement
validates the transform itself, not just expression mirroring.

q_sfa_words_dft (full DFT+equi-depth pipeline) is registered without an
oracle → driver rows-only check; its correctness is covered by the
property tests in tests/test_spectral.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sfa_spark.functions import spectral
from sfa_spark.operators import bags, sfa
from sfa_spark.queries import rnd, series_df
from sfa_spark.sources.events import series_to_arrays

DFT_L = 8      # whole-series DFT: coefficients 1..4 (8 interleaved values)
MFT_W = 16     # sliding MFT window
MFT_L = 4      # values per window (coefficients 1..2, norm_mean drops DC)


def _arrays(spark, sf_dir):
    return series_to_arrays(series_df(spark, sf_dir))


def q_dft_coefs(spark, sf_dir):
    arr = _arrays(spark, sf_dir)
    coefs = spectral.dft(arr, DFT_L, pad_pow2=True)
    return spectral.coefs_to_long(coefs).select(
        "series_id", "seg", rnd("coef", 4).alias("coef")
    )


def q_mft_sliding(spark, sf_dir):
    arr = _arrays(spark, sf_dir).where(F.size("values") >= MFT_W)
    coefs = spectral.mft_sliding(arr, w=MFT_W, l=MFT_L, norm_mean=True)
    return spectral.coefs_to_long(coefs).select(
        "series_id", "win", "seg", rnd("coef", 4).alias("coef")
    )


def q_sfa_words_dft(spark, sf_dir):
    """Full SFA: equi-depth bins fitted on disjoint windows → sliding
    words. No SQL oracle (binning on rounded orderlines is brittle to
    mirror); driver does the rows-only check."""
    arr = _arrays(spark, sf_dir).where(F.size("values") >= MFT_W)
    model = sfa.fit(
        arr, window=MFT_W, word_length=MFT_L, alphabet=4,
        histogram="equi_depth", norm_mean=True,
    )
    wd = sfa.transform_windowing(model, arr)
    return bags.bag_of_words(bags.numerosity_reduce(wd))
