"""TF-IDF document vectors and similarity via the pyspark.ml feature
pipeline (Tokenizer → HashingTF → IDF → Normalizer) — the MLlib-native
counterpart of the hand-rolled term stats in ext_term_freq.

Why MLlib here instead of column expressions: IDF is a *fitted*
transform (document frequencies are corpus statistics), and the ml
Pipeline persists the fitted vocabulary weights with the model — the
same train/apply split as the classifier layer. Feature hashing keeps
the vector width fixed (no vocabulary shuffle, no OOV problem at
100 TB: the map-side transform is embarrassingly parallel; only the
IDF fit aggregates — one pass, one reduce).

Similarity: vectors are L2-normalized so cosine == dot product; top-k
pairs via the same exploded-join shape as operators/similarity.py.
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import IDF, HashingTF, Normalizer, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_pipeline(
    text_col: str = "text", n_features: int = 1 << 12
) -> Pipeline:
    """Unfitted Tokenizer→HashingTF→IDF→Normalizer pipeline."""
    return Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="_tokens",
                pattern="\\W+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="_tokens", outputCol="_tf", numFeatures=n_features
            ),
            IDF(inputCol="_tf", outputCol="_tfidf"),
            Normalizer(inputCol="_tfidf", outputCol="tfidf", p=2.0),
        ]
    )


def fit_tfidf(
    docs: DataFrame, text_col: str = "text", n_features: int = 1 << 12
) -> PipelineModel:
    """Fit the corpus statistics (IDF weights). The fitted model is
    Spark-persistable (model.save/load) like every pipeline here."""
    return tfidf_pipeline(text_col, n_features).fit(docs)


def tfidf_vectors(
    docs: DataFrame,
    model: PipelineModel,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tfidf) with unit-norm sparse vectors."""
    return model.transform(docs).select(id_col, "tfidf")


def tfidf_similar_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 12,
) -> DataFrame:
    """Document pairs with TF-IDF cosine >= threshold (id_a < id_b).

    Join shape: explode each vector to (feature_idx, weight) postings
    and equi-join on feature_idx — an inverted-index join, so only
    pairs sharing at least one term are ever compared (vs the O(n²)
    cross join). Cosine = sum of weight products thanks to unit norm.
    """
    from pyspark.ml.functions import vector_to_array

    model = fit_tfidf(docs, text_col, n_features)
    vecs = tfidf_vectors(docs, model, id_col).select(
        id_col, vector_to_array("tfidf").alias("arr")
    )
    postings = vecs.select(
        id_col,
        F.posexplode("arr").alias("feature_idx", "w"),
    ).where(F.col("w") != 0.0)
    a = postings.select(
        F.col(id_col).alias("id_a"),
        "feature_idx",
        F.col("w").alias("wa"),
    )
    b = postings.select(
        F.col(id_col).alias("id_b"),
        "feature_idx",
        F.col("w").alias("wb"),
    )
    return (
        a.join(b, "feature_idx")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
