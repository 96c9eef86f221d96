"""Model-based quality filtering: a hashed-feature logistic classifier.

The GPT-3 / CCNet / DCLM-style curation step the heuristic
``quality_score`` (operators/textstats.py) cannot replace: score every
document by a linear model trained to separate a high-quality reference
corpus (positives) from random crawl text (negatives), then filter or
importance-sample on the score. A linear probe over hashed token features
is exactly what those pipelines shipped — fastText-class accuracy, no
vocabulary state, embarrassingly scalable scoring.

100 TB design:
- TRAINING is driver-side pure Python over a BOUNDED labeled sample — quality
  classifier training sets are small by construction (a reference-corpus
  slice vs a random-crawl slice; thousands of rows), so the collect is
  bounded by the labeled set, never the corpus. Full-batch gradient
  descent with deterministic init ⇒ identical weights every run.
- FEATURES are the signed hashed-TF embedding (operators/hashvec.py,
  md5-derived → cross-engine exact), computed the SAME way at fit and
  score time. The pure-Python twin (`_embed_py`) mirrors the Spark
  column expressions digit-for-digit so a model can also be fit with no
  SparkSession at all (`fit_quality_classifier_local`) — which keeps
  registry/test weights reproducible as plain literals.
- SCORING is JVM-only: hash_embed's two keyed aggregations, then the
  dot product STATICALLY EXPANDED over the dim dimensions in fixed index
  order (the semdedup lesson: interpreted ``aggregate``/``zip_with``
  lambdas were 43× slower at the 10× probe; a fixed-order chain also
  makes the float summation order engine-reproducible) + a sigmoid.
  No Python, no extra shuffle beyond hash_embed's own.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rdfproject_msc_spark.operators.hashvec import hash_embed


@dataclass(frozen=True)
class QualityModel:
    """Immutable fitted model: ``prob = sigmoid(w · embed(text) + b)``."""

    dim: int
    weights: tuple[float, ...]
    bias: float


def _embed_py(text: str, dim: int) -> list[float]:
    """Pure-Python twin of hashvec.hash_embed for ONE document: same md5
    digit ranges (hex 1-6 → index, hex 7 parity → sign), same L2 norm,
    same float32 rounding of each element (numpy-free: struct round-trip)."""
    import struct

    toks = [
        t
        for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split(" ")
        if t
    ]
    vec = [0.0] * dim
    for t in toks:
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        idx = int(h[0:6], 16) % dim
        sgn = 1.0 if int(h[6], 16) % 2 == 0 else -1.0
        vec[idx] += sgn
    nrm = math.sqrt(math.fsum(x * x for x in vec))
    if nrm == 0.0:
        return vec
    return [
        struct.unpack("f", struct.pack("f", x / nrm))[0] for x in vec
    ]


def _fit(xs: list[list[float]], ys: list[int], dim: int, *,
         epochs: int, lr: float, l2: float) -> QualityModel:
    """Deterministic full-batch logistic GD (zero init, fixed order)."""
    n = len(xs)
    if n == 0:
        raise ValueError("cannot fit a quality classifier on zero rows")
    w = [0.0] * dim
    b = 0.0
    for _ in range(epochs):
        gw = [0.0] * dim
        gb = 0.0
        for x, y in zip(xs, ys):
            z = b + sum(wi * xi for wi, xi in zip(w, x))
            p = 1.0 / (1.0 + math.exp(-z))
            d = p - y
            gb += d
            for i in range(dim):
                if x[i] != 0.0:
                    gw[i] += d * x[i]
        w = [wi - lr * (gwi / n + l2 * wi) for wi, gwi in zip(w, gw)]
        b -= lr * gb / n
    return QualityModel(dim, tuple(w), b)


def fit_quality_classifier_local(
    texts: list[str],
    labels: list[int],
    *,
    dim: int = 64,
    epochs: int = 300,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> QualityModel:
    """Fit with NO SparkSession — the labeled sample is in memory by
    definition. Feature path is the exact Python twin of the Spark one,
    so the model scores identically either way."""
    xs = [_embed_py(t, dim) for t in texts]
    return _fit(xs, list(labels), dim, epochs=epochs, lr=lr, l2=l2)


def fit_quality_classifier(
    labeled: DataFrame,
    *,
    dim: int = 64,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    epochs: int = 300,
    lr: float = 1.0,
    l2: float = 1e-3,
) -> QualityModel:
    """Fit from a labeled DataFrame: features distributively via
    hash_embed, then ONE collect bounded by the labeled sample, then the
    same deterministic core as the local fit (rows ordered by id for
    run-to-run stability)."""
    emb = hash_embed(
        labeled.select(id_col, text_col), dim=dim,
        text_col=text_col, id_col=id_col,
    )
    rows = (
        emb.join(labeled.select(id_col, label_col), id_col)
        .orderBy(id_col)
        .collect()
    )
    xs = [list(r["embedding"]) for r in rows]
    ys = [int(r[label_col]) for r in rows]
    return _fit(xs, ys, dim, epochs=epochs, lr=lr, l2=l2)


def score_py(model: QualityModel, text: str) -> float:
    """Python twin of the scoring expression (same fixed summation
    order)."""
    x = _embed_py(text, model.dim)
    z = model.bias
    for i in range(model.dim):
        z += model.weights[i] * x[i]
    return 1.0 / (1.0 + math.exp(-z))


def quality_scores(
    docs: DataFrame,
    model: QualityModel,
    *,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, quality_prob, kept): the model's probability that each
    document is reference-quality, and the threshold verdict. Embedding +
    statically-expanded dot product + sigmoid — JVM end to end."""
    emb = hash_embed(docs, dim=model.dim, text_col=text_col, id_col=id_col)
    z = F.lit(float(model.bias))
    for i in range(model.dim):
        z = z + F.lit(float(model.weights[i])) * F.get(
            F.col("embedding"), i
        ).cast("double")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return emb.select(
        F.col(id_col),
        prob.alias("quality_prob"),
        (prob >= F.lit(float(threshold))).alias("kept"),
    )


# ---------------------------------------------------------------------------
# Reference model: fit on the fixed built-in labeled sample below by
# fit_quality_classifier_local (deterministic — zero init, fixed order), so
# the weights are reproducible literals: tests re-fit and assert equality,
# and the registry's DuckDB oracle inlines the same numbers. The sample is
# the classic shape — reference-quality prose positives vs junk/spam
# negatives with (deliberately) disjoint vocabularies.

REFERENCE_POS = [
    "the committee published its annual report on regional water quality",
    "researchers measured how sleep duration affects memory in older adults",
    "the novel follows three generations of a family through the war years",
    "engineers tested the bridge design under simulated earthquake loads",
    "the recipe calls for fresh basil tomatoes and a drizzle of olive oil",
    "students presented their findings at the national science fair",
    "the orchestra performed the complete symphony to a full house",
    "historians traced the trade route through the mountain passes",
    "the court ruled that the contract clause was unenforceable",
    "farmers rotated their crops to restore nitrogen to the soil",
    "the documentary examines daily life in a remote fishing village",
    "the library extended its hours during the examination period",
    "astronomers confirmed the planet transit with two independent telescopes",
    "the city council approved funding for the new bicycle lanes",
    "her essay argues that translation is itself a form of authorship",
    "the patients recovered faster when treatment began within a week",
    "volunteers planted native grasses along the eroded riverbank",
    "the museum restored the fresco using archival photographs as a guide",
    "economists compared inflation expectations across survey methods",
    "the trail climbs steadily through cedar forest to an alpine meadow",
]


REFERENCE_NEG = [
    "click here click here free money win win win",
    "zzzz qqqq xxxx jjjj kkkk vvvv wwww",
    "buy cheap buy cheap best price best price best price",
    "asdf qwer zxcv uiop hjkl bnm asdf qwer",
    "aaa aaa aaa aaa aaa aaa aaa aaa aaa",
    "lorem9 ipsum7 dolor3 sit1 amet8 consect4",
    "subscribe now subscribe now limited offer limited offer",
    "xj3k v9q2 pl0w mn8b zt5y qw1e rr7u",
    "download free download free no signup no signup",
    "casino bonus casino bonus jackpot jackpot jackpot",
    "hot deals hot deals act now act now act now",
    "qqq www eee rrr ttt yyy uuu iii ooo ppp",
    "kfj34 sdkl2 vmc93 qpz81 xnd56 rty44",
    "100 percent free 100 percent free guaranteed winner",
    "zzz111 yyy222 xxx333 www444 vvv555 uuu666",
    "cheap pills cheap pills fast shipping fast shipping",
    "blah blah blah blah blah blah blah blah",
    "x1 x2 x3 x4 x5 x6 x7 x8 x9 x0 x1 x2",
    "win big win big win big claim prize claim prize",
    "fffff ggggg hhhhh jjjjj kkkkk lllll",
]


REFERENCE_MODEL = QualityModel(
    dim=64,
    bias=-1.2528658215094144,
    weights=(
    -0.7972360495599771,
    0.4290342303298942,
    1.5433302969380354,
    -0.15709830881447062,
    0.9261749673249845,
    -0.485177882377721,
    -0.5255105018116718,
    -0.5097855316491786,
    -0.6964164095824948,
    0.9483800650509812,
    0.0,
    -0.07703630560725477,
    0.5277123763172579,
    -0.15390518944235404,
    -0.10406390946823824,
    0.07393898698377445,
    -0.6286565192049728,
    0.9006717627084063,
    0.7422251107032468,
    -0.5300019169390148,
    0.03721092726336367,
    -0.24229626817882444,
    0.42787491804181904,
    -0.2308778739591241,
    -1.0817560965225168,
    -1.7995394064498105,
    -0.07045806168356931,
    0.1977963051262789,
    0.5091187284216991,
    -1.610812852343671,
    0.4926513829995381,
    0.45227167960137116,
    -0.9615741175026105,
    -0.3974267526978115,
    1.4659753277531438,
    2.231888203019327,
    -0.16708701279107382,
    0.1371740807005937,
    0.2917979547424385,
    -0.40714795395382575,
    0.500127622503101,
    0.631813613188177,
    0.9494981619356456,
    0.1991761206977081,
    7.279537939372065,
    -0.14322683685114565,
    -0.6062129821063522,
    0.6025105790284597,
    1.8482466862388085,
    -0.4906145746341724,
    -0.8482629170937832,
    -0.7389113696488447,
    -1.1497722891177928,
    -1.2170388624172994,
    -0.07393898698377445,
    -0.27763140173863116,
    -0.2749123772233421,
    1.2873735317598363,
    0.7608250024111263,
    0.36318086206693495,
    0.990167783605805,
    1.472813518612598,
    -0.05808950834236558,
    0.43741876081385944,
),
)
