"""Model scoring / training kernels (SURVEY.md §2.9).

M1 — the reference's location predictor is a Gibbs-style sampler over
matrices loaded from whitespace files, invoked per 5-message batch
(TopicModelBolt.java:87-99,168; bytecode jgibblda.PredictLocation#predict;
geographic topic model with von-Mises-Fisher region densities per
Kling et al., WSDM 2014). Spark mapping: the matrices are a driver-
side numpy bundle broadcast into an ``applyInPandas`` over batch
groups — Arrow-vectorized, executor-parallel, seeded for tests.

The scoring here is a deterministic collapsed estimate (expected
topic mixture x region density) rather than the reference's
`Math.random` Gibbs chain: same inputs, same matrices, same output
shape (per-doc region probabilities), reproducible across runs. A
seeded-Gibbs mode can be fixture-matched later; the sampler's
randomness makes it non-oracle-checkable either way (SURVEY.md §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LocationModel:
    """Model bundle (matrices the reference loads from files, S12:
    topic_word [K x V], pi_0 [K], region_topic [L x K], regions [L x 2
    lat/long])."""

    topic_word: np.ndarray
    pi_0: np.ndarray
    region_topic: np.ndarray
    regions: np.ndarray

    @classmethod
    def deterministic(cls, n_topics: int = 8, vocab: int = 512, n_regions: int = 16, seed: int = 42):
        """Seeded synthetic model for tests/benchmarks (the real
        model files are downloaded artifacts, S8 — not in repo)."""
        rng = np.random.default_rng(seed)
        tw = rng.dirichlet(np.ones(vocab), size=n_topics)
        pi = rng.dirichlet(np.ones(n_topics))
        rt = rng.dirichlet(np.ones(n_topics), size=n_regions)
        regions = np.stack(
            [rng.uniform(-60, 60, n_regions), rng.uniform(-180, 180, n_regions)], axis=1
        )
        return cls(tw, pi, rt, regions)


def predict_locations(
    docs: DataFrame,
    model: LocationModel,
    doc_col: str = "doc_id",
    token_ids_col: str = "token_ids",
    batch_size: int = 5,
    top_k: int = 5,
) -> DataFrame:
    """M1 + W2 + T1 — batch the docs (floor(id/batch_size), the
    deterministic analog of the reference's 5-message buffer), score
    each doc against every region, emit top-k (location, probability)
    pairs with the reference's "lon,lat" float key (P10).

    ``token_ids`` is a space-separated id string (X5 output / E4).
    """
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(
        (model.topic_word, model.pi_0, model.region_topic, model.regions)
    )

    batched = docs.withColumn("_batch", F.floor(F.col(doc_col) / batch_size))

    def score(pdf):
        import pandas as pd

        tw, pi, rt, regions = bc.value
        vocab = tw.shape[1]
        out_rows = []
        for _, row in pdf.iterrows():
            ids = [int(t) % vocab for t in str(row[token_ids_col]).split() if t.strip()]
            if ids:
                # expected topic mixture given tokens (collapsed, no sampling)
                theta = pi * np.prod(tw[:, ids] + 1e-12, axis=1) ** (1.0 / len(ids))
            else:
                theta = pi.copy()
            theta /= theta.sum()
            region_scores = rt @ theta
            region_probs = region_scores / region_scores.sum()
            top = np.argsort(-region_probs)[:top_k]
            for r in top:
                lat, lon = regions[r]
                out_rows.append(
                    {
                        doc_col: row[doc_col],
                        "location": f"{np.float32(lon)},{np.float32(lat)}",
                        "probability": float(region_probs[r]),
                    }
                )
        return pd.DataFrame(
            out_rows, columns=[doc_col, "location", "probability"]
        )

    return batched.groupBy("_batch").applyInPandas(
        score, schema=f"{doc_col} long, location string, probability double"
    )


def predict_locations_vectorized(
    docs: DataFrame,
    model: LocationModel,
    doc_col: str = "doc_id",
    token_ids_col: str = "token_ids",
    top_k: int = 5,
) -> DataFrame:
    """M1, Arrow-throughput variant: identical per-doc output to
    :func:`predict_locations` (same collapsed estimate, same top-k,
    same 'lon,lat' keys) computed via ``mapInPandas`` — ONE Python
    call per Arrow batch with fully vectorized numpy (segment-summed
    log-likelihoods, one GEMM for region scores) instead of one
    pandas group per 5-doc buffer. Use this when scoring a large
    corpus; the grouped variant remains the W2-shaped streaming
    analog. ~10**2 fewer Python crossings on a 50k-doc table.
    """
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(
        (model.topic_word, model.pi_0, model.region_topic, model.regions)
    )

    def score(batches):
        import pandas as pd

        tw, pi, rt, regions = bc.value
        vocab = tw.shape[1]
        log_tw = np.log(tw + 1e-12)  # K x V
        log_pi = np.log(pi)
        for pdf in batches:
            if pdf.empty:
                continue
            ids_per_doc = [
                np.array(
                    [int(t) % vocab for t in str(s).split() if t.strip()], dtype=np.int64
                )
                for s in pdf[token_ids_col]
            ]
            lens = np.array([len(a) for a in ids_per_doc])
            D = len(ids_per_doc)
            flat = np.concatenate([a for a in ids_per_doc if len(a)]) if lens.sum() else np.array([], dtype=np.int64)
            ptr = np.zeros(D + 1, dtype=np.int64)
            np.cumsum(lens, out=ptr[1:])
            # log theta (pre-normalization): K x D
            lt = np.tile(log_pi[:, None], (1, D))
            if len(flat):
                seg = np.add.reduceat(log_tw[:, flat], ptr[:-1][lens > 0], axis=1)
                lt[:, lens > 0] += seg / lens[lens > 0]
            theta = np.exp(lt - lt.max(axis=0, keepdims=True))
            theta /= theta.sum(axis=0, keepdims=True)
            region_scores = rt @ theta  # L x D
            region_probs = region_scores / region_scores.sum(axis=0, keepdims=True)
            top = np.argsort(-region_probs, axis=0)[:top_k]  # k x D
            doc_ids = pdf[doc_col].to_numpy()
            out_doc = np.repeat(doc_ids, top_k)
            flat_top = top.T.ravel()
            probs = region_probs[flat_top, np.repeat(np.arange(D), top_k)]
            lat = regions[flat_top, 0].astype(np.float32)
            lon = regions[flat_top, 1].astype(np.float32)
            yield pd.DataFrame(
                {
                    doc_col: out_doc,
                    "location": [f"{x},{y}" for x, y in zip(lon, lat)],
                    "probability": probs.astype(np.float64),
                }
            )

    return docs.select(doc_col, token_ids_col).mapInPandas(
        score, schema=f"{doc_col} long, location string, probability double"
    )


def seeded_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """M3 — probability-threshold filter (`Math.random() > p`),
    reference HTMLMapFilterer.java:33-71 — as a seeded Bernoulli
    sample (reproducible, partition-parallel)."""
    return df.sample(fraction=fraction, seed=seed)


def deterministic_sample(df: DataFrame, id_col: str, keep_percent: int) -> DataFrame:
    """M3 (oracle-checkable variant) — hash-based deterministic
    sampling: keep rows whose md5(id) low byte falls under the
    threshold. Engine-independent (md5 is md5 everywhere), unlike
    seeded PRNG sampling."""
    bucket = F.conv(F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 2), 16, 10).cast("int")
    return df.filter(bucket < (256 * keep_percent) // 100)
