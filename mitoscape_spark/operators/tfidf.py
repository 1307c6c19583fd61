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

    Join shape: sparse blocked GEMM (operators.dedup.
    sparse_near_duplicates) over (doc, feature_idx, weight) postings.
    Two textbook alternatives rejected with measurements:
    - inverted-index join on feature_idx — cost is Σ df², so a handful
      of high-document-frequency terms explode it quadratically
      (measured 46 s on 6k docs vs ~4 s for the blocked form; see
      operators.dedup.ngram_jaccard_pairs for where the inverted index
      DOES win: huge vocabularies with uniformly low DF);
    - dense block packing — 4096-dim dense arrays cost nnz × bloat in
      JVM heap (boxed doubles; executor OOM at 6k docs). Postings stay
      nnz-proportional; densification happens in numpy buffers.
    """
    from pyspark.ml.functions import vector_to_array

    from mitoscape_spark.operators.dedup import sparse_near_duplicates

    model = fit_tfidf(docs, text_col, n_features)
    vecs = tfidf_vectors(docs, model, id_col).select(
        F.col(id_col).alias("id"), vector_to_array("tfidf").alias("arr")
    )
    postings = vecs.select(
        "id", F.posexplode("arr").alias("idx", "w")
    ).where(F.col("w") != 0.0)
    return sparse_near_duplicates(
        postings, n_dims=n_features, threshold=threshold
    ).select("id_a", "id_b", F.col("cos").alias("cosine"))
