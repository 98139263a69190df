"""pyspark.ml Pipeline wrappers (SURVEY §2.10): the engine's fit/
transform operators as composable MLlib stages, so users assemble
  Pipeline([SFAWords(), BagOfPatterns(), ...]).fit(train).transform(test)
exactly like any other Spark ML workflow.

Stages operate on the array form (series_id, values) and append
columns; fitted state (SFA bins) lives in the model object and is
broadcast at transform time — the same artifacts SFAModel.save/load
persists.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model, Transformer
from pyspark.ml.param import Param, Params
from pyspark.sql import DataFrame

from sfa_spark.operators import bags as B
from sfa_spark.operators import sfa as SFA


class _HasSFAParams(Params):
    window = Param(Params._dummy(), "window", "sliding window length")
    wordLength = Param(Params._dummy(), "wordLength", "SFA word length")
    alphabet = Param(Params._dummy(), "alphabet", "alphabet size")
    histogram = Param(Params._dummy(), "histogram", "binning strategy")

    def __init__(self):
        super().__init__()
        self._setDefault(window=16, wordLength=4, alphabet=4, histogram="equi_depth")


class SFAWords(Estimator, _HasSFAParams):
    """Estimator: fits SFA bins on disjoint windows; its model maps the
    array column to sliding packed words (series_id, win, word)."""

    @keyword_only
    def __init__(self, window=16, wordLength=4, alphabet=4, histogram="equi_depth"):
        super().__init__()
        self._set(window=window, wordLength=wordLength, alphabet=alphabet, histogram=histogram)

    def _fit(self, dataset: DataFrame) -> "SFAWordsModel":
        model = SFA.fit(
            dataset,
            window=self.getOrDefault(self.window),
            word_length=self.getOrDefault(self.wordLength),
            alphabet=self.getOrDefault(self.alphabet),
            histogram=self.getOrDefault(self.histogram),
        )
        return SFAWordsModel(model)


class SFAWordsModel(Model, _HasSFAParams):
    def __init__(self, sfa_model: SFA.SFAModel | None = None):
        super().__init__()
        self.sfa_model = sfa_model

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return SFA.transform_windowing(self.sfa_model, dataset)


class BagOfPatterns(Transformer):
    """Transformer: words → numerosity-reduced bag counts
    (series_id, word, cnt)."""

    def _transform(self, dataset: DataFrame) -> DataFrame:
        return B.bag_of_words(B.numerosity_reduce(dataset))
