"""Language identification — a real character-n-gram classifier, not a
marker-list heuristic.

Model: multinomial Naive Bayes over hashed BYTE trigrams (the fastText /
CLD2 family's core signal; byte n-grams handle any UTF-8 script without
tokenization). Per-language log-probability tables are trained at import
time from embedded seed corpora (public common text — function words,
pronouns, sample sentences per language), so the container needs no
external model file. The algorithm is Cavnar–Trenkle-style n-gram LID
(\"N-Gram-Based Text Categorization\", 1994) with NB scoring instead of
rank-distance — fully vectorized.

Ray shape: the model is built ONCE PER ACTOR in ``_LangIDStage.__init__``
(the stateful actor-pool pattern for model-scoring stages); ``__call__``
scores whole Arrow batches with numpy — no per-row python.

Scores: ``lang_score`` is the mean per-trigram log-likelihood margin
between the best and second-best language (nats/trigram, >= 0) — a
calibration-free confidence. Docs with < 3 bytes get ``und`` / 0.0.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# embedded seed corpora (public common text; ~1 paragraph per language).
# Function words + pronouns + orthographic signatures carry nearly all the
# trigram signal — these are the highest-frequency words of each language.
# ---------------------------------------------------------------------------
_SEED: dict[str, str] = {
    "en": (
        "the quick brown fox jumps over the lazy dog and then it runs away "
        "this is a sentence about the weather which has been quite nice "
        "we would like to know what you think about that because it matters "
        "there are many things that could have been done differently here "
        "people often say that the best way to learn is by doing something "
        "she said that they will not be able to come to the meeting today "
        "of course you can always ask for help when you need it the most "
        "it was the first time that anyone had ever seen such a thing"
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund und läuft weg "
        "das ist ein satz über das wetter das in letzter zeit schön war "
        "wir möchten gerne wissen was sie darüber denken weil es wichtig ist "
        "es gibt viele dinge die man anders hätte machen können "
        "die leute sagen oft dass man am besten durch übung lernt "
        "sie sagte dass sie heute nicht zur besprechung kommen können "
        "natürlich kannst du immer um hilfe bitten wenn du sie brauchst "
        "es war das erste mal dass jemand so etwas gesehen hatte"
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux et s'enfuit "
        "ceci est une phrase sur le temps qui a été très agréable récemment "
        "nous aimerions savoir ce que vous en pensez parce que c'est important "
        "il y a beaucoup de choses qui auraient pu être faites autrement "
        "les gens disent souvent que la meilleure façon d'apprendre est de faire "
        "elle a dit qu'ils ne pourront pas venir à la réunion aujourd'hui "
        "bien sûr vous pouvez toujours demander de l'aide quand vous en avez besoin "
        "c'était la première fois que quelqu'un voyait une telle chose"
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso y se escapa "
        "esta es una frase sobre el tiempo que ha sido muy agradable últimamente "
        "nos gustaría saber lo que usted piensa porque es importante "
        "hay muchas cosas que se podrían haber hecho de otra manera "
        "la gente suele decir que la mejor forma de aprender es haciendo "
        "ella dijo que no podrán venir a la reunión de hoy "
        "por supuesto siempre puedes pedir ayuda cuando la necesites "
        "era la primera vez que alguien había visto algo así"
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro e scappa via "
        "questa è una frase sul tempo che è stato molto bello ultimamente "
        "vorremmo sapere cosa ne pensa perché è importante per noi "
        "ci sono molte cose che si sarebbero potute fare diversamente "
        "la gente dice spesso che il modo migliore per imparare è fare "
        "lei ha detto che non potranno venire alla riunione di oggi "
        "naturalmente puoi sempre chiedere aiuto quando ne hai bisogno "
        "era la prima volta che qualcuno vedeva una cosa del genere"
    ),
    "pt": (
        "a rápida raposa marrom pula sobre o cão preguiçoso e foge "
        "esta é uma frase sobre o tempo que tem estado muito bom ultimamente "
        "gostaríamos de saber o que você acha porque isso é importante "
        "há muitas coisas que poderiam ter sido feitas de outra forma "
        "as pessoas costumam dizer que a melhor maneira de aprender é fazendo "
        "ela disse que eles não poderão vir à reunião de hoje "
        "claro que você sempre pode pedir ajuda quando precisar "
        "foi a primeira vez que alguém viu uma coisa dessas"
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond en rent weg "
        "dit is een zin over het weer dat de laatste tijd erg mooi was "
        "wij zouden graag willen weten wat u ervan vindt omdat het belangrijk is "
        "er zijn veel dingen die anders gedaan hadden kunnen worden "
        "mensen zeggen vaak dat je het beste leert door iets te doen "
        "zij zei dat ze vandaag niet naar de vergadering kunnen komen "
        "natuurlijk kun je altijd om hulp vragen wanneer je die nodig hebt "
        "het was de eerste keer dat iemand zoiets had gezien"
    ),
    "zh": (
        "快速的棕色狐狸跳过懒惰的狗然后跑开了 "
        "这是一个关于天气的句子最近天气很好 "
        "我们想知道您的想法因为这很重要 "
        "有很多事情本可以用不同的方式完成 "
        "人们常说学习的最好方法就是去做 "
        "她说他们今天不能来参加会议了 "
        "当然你需要帮助的时候随时可以开口 "
        "这是第一次有人见到这样的东西"
    ),
}

_BUCKET_BITS = 16
_N_BUCKETS = 1 << _BUCKET_BITS
_HASH_MULT = np.uint32(2654435761)  # Knuth multiplicative hash
_ALPHA = 0.5  # Laplace smoothing


def _trigram_buckets(texts: pa.Array | pa.ChunkedArray):
    """Vectorized byte-trigram bucket ids over an Arrow string column.

    Returns (buckets uint32, doc_of int64, tri_counts int64) — every
    trigram of every doc, flat, with its row index. Zero python per row:
    works directly on the column's UTF-8 values buffer.
    """
    arr = texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.utf8_lower(arr.cast(pa.large_string())).fill_null("")
    if isinstance(arr, pa.ChunkedArray):  # compute may re-chunk
        arr = arr.combine_chunks()
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8)
        if buf is not None
        else np.empty(0, np.uint8)
    )
    starts, ends = offsets[:-1], offsets[1:]
    tri_counts = np.maximum(ends - starts - 2, 0)
    n_tri = int(tri_counts.sum())
    doc_of = np.repeat(np.arange(len(starts), dtype=np.int64), tri_counts)
    if n_tri == 0:
        return np.empty(0, np.uint32), doc_of, tri_counts
    # absolute byte position of each trigram start
    head = np.cumsum(tri_counts) - tri_counts
    pos = (
        np.arange(n_tri, dtype=np.int64)
        - np.repeat(head, tri_counts)
        + np.repeat(starts, tri_counts)
    )
    codes = (
        (data[pos].astype(np.uint32) << np.uint32(16))
        | (data[pos + 1].astype(np.uint32) << np.uint32(8))
        | data[pos + 2].astype(np.uint32)
    )
    return ((codes * _HASH_MULT) >> np.uint32(32 - _BUCKET_BITS)).astype(
        np.uint32
    ), doc_of, tri_counts


class LangIDModel:
    """Hashed byte-trigram Naive Bayes over the embedded seed profiles."""

    def __init__(self, seeds: dict[str, str] | None = None):
        seeds = seeds or _SEED
        self.langs = list(seeds)
        lp = np.empty((len(self.langs), _N_BUCKETS), dtype=np.float32)
        for li, lang in enumerate(self.langs):
            b, _, _ = _trigram_buckets(pa.array([seeds[lang]]))
            counts = np.bincount(b, minlength=_N_BUCKETS).astype(np.float64)
            probs = (counts + _ALPHA) / (counts.sum() + _ALPHA * _N_BUCKETS)
            lp[li] = np.log(probs)
        self.log_prob = lp

    def score_batch(self, texts) -> tuple[list[str], np.ndarray]:
        """(lang_pred, lang_score) for a column of texts. Score is the mean
        per-trigram log-likelihood margin best-vs-runner-up (>= 0)."""
        buckets, doc_of, tri_counts = _trigram_buckets(texts)
        n = len(tri_counts)
        ll = np.zeros((n, len(self.langs)))
        for li in range(len(self.langs)):
            contrib = self.log_prob[li][buckets]
            ll[:, li] = np.bincount(doc_of, weights=contrib, minlength=n)
        denom = np.maximum(tri_counts, 1)
        mean_ll = ll / denom[:, None]
        order = np.argsort(mean_ll, axis=1)
        best, second = order[:, -1], order[:, -2]
        margin = (
            mean_ll[np.arange(n), best] - mean_ll[np.arange(n), second]
        )
        has_signal = tri_counts > 0
        preds = [
            self.langs[b] if ok else "und"
            for b, ok in zip(best, has_signal)
        ]
        return preds, np.where(has_signal, np.round(margin, 6), 0.0)

    def classify(self, text: str) -> tuple[str, float]:
        preds, scores = self.score_batch(pa.array([text]))
        return preds[0], float(scores[0])


class _LangIDStage:
    """Actor-pool stage: model built once per actor (__init__), whole
    Arrow batches scored per __call__ — the model-inference map_batches
    shape (same as pipelines/multimodal.py's FeatureStage)."""

    def __init__(self, key: str, text: str):
        self.key, self.text = key, text
        self.model = LangIDModel()

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = self.model.score_batch(batch[self.text])
        return pa.table(
            {
                self.key: batch[self.key],
                "lang_pred": pa.array(preds, type=pa.string()),
                "lang_score": pa.array(scores),
            }
        )


def language_id(
    sf_dir: str,
    key: str = "doc_id",
    text: str = "text",
    *,
    concurrency: int | None = None,
):
    """(key, lang_pred, lang_score) via the byte-trigram NB classifier."""
    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=[key, text]
    )
    # autoscaling pool with min=1: a fixed pool the size of the cluster
    # (e.g. 4 actors on the 4-CPU test cluster) reserves every CPU and
    # starves the upstream read tasks — observed livelock.
    return ds.map_batches(
        _LangIDStage,
        batch_format="pyarrow",
        fn_constructor_kwargs={"key": key, "text": text},
        concurrency=concurrency or (1, 8),
    )
