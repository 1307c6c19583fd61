"""Model-based document-quality filtering: a distributed linear text
classifier (tokenize → hashed TF → logistic regression), the
fastText-style quality gate modern corpus pipelines run after the
heuristic rules (operators/textstats.py::quality_scores/gopher_rules).

Why this shape at 100 TB:
- **HashingTF, not a vocabulary.** CountVectorizer needs a global
  vocabulary build (a full shuffle over all terms + a driver-held map);
  feature hashing is stateless per row — no fit pass, no broadcast
  dictionary, identical features on any cluster layout.
- **Linear model.** LR training is treeAggregate over gradient sums —
  one pass per L-BFGS iteration, no per-row Python; scoring is a single
  JVM-side dot product per document.
- **Same persistence discipline as the RF/GBT twins**
  (`pipeline/ml.py::_strip_summary`): freshly-fit models carry a
  session-bound training summary that breaks task serialization once
  Observations exist — always return the reloaded, summary-free form.

The heuristic gates stay first in the pipeline order: they're free
column expressions; the model prices what heuristics can't linearly
see (token co-occurrence), trained on whatever labels exist —
here, bootstrap labels from the heuristic rules themselves
(noisy-teacher distillation), in production human/LLM labels.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mitoscape_spark.pipeline.ml import _strip_summary

N_FEATURES = 1 << 16


def train_quality_model(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    model_path: str | None = None,
    seed: int = 42,
) -> PipelineModel:
    """Fit the tokenizer→TF→LR pipeline on (text, label∈{0,1}) rows."""
    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_tokens", pattern="\\s+", toLowercase=True
    )
    tf = HashingTF(
        inputCol="_tokens", outputCol="features", numFeatures=N_FEATURES
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=30,
        regParam=1e-4,
        standardization=False,
    )
    model = Pipeline(stages=[tok, tf, lr]).fit(labeled)
    return _strip_summary(model, model_path)


def score_quality(
    model: PipelineModel, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, prob_good): P(label=1) per document — vector slot 1 via
    vector_to_array, no UDF (same A5 pattern as ml.max_probability)."""
    from pyspark.ml.functions import vector_to_array

    return model.transform(docs).select(
        F.col(id_col),
        vector_to_array("probability").getItem(1).alias("prob_good"),
    )


def bootstrap_labels(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Noisy-teacher labels from the heuristic rule gate: 1 where the
    Gopher-style rules pass. Lets the model train without human labels
    and generalize past the rules' hard thresholds."""
    from mitoscape_spark.operators.textstats import gopher_rules

    rules = gopher_rules(docs, text_col)
    return docs.join(
        rules.select("doc_id", F.col("passes").cast("double").alias("label")),
        "doc_id",
    )
