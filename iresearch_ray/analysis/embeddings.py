"""Word-embedding model + the ``classification`` / ``nearest_neighbors``
analyzers.

Functional rebuild of the reference's fastText-backed streams
(``core/analysis/classification_stream.cpp``,
``core/analysis/nearest_neighbors_stream.cpp``) without the native
fastText dependency: the model is a plain ``.npz`` holding a sorted
vocabulary, L2-normalized word vectors and (for classification) label
centroids. The analyzer math mirrors fastText's supervised head — a
document vector is the mean of its token vectors and classification is
nearest label centroid by cosine — so a real fastText model exported to
this layout behaves identically; the bundled trainer builds word vectors
by random indexing (hash-seeded Gaussian projections), which makes the
centroid classifier a linear model over hashed bag-of-words features.

Token-stream semantics match the reference exactly:

- ``classification``: the top-k labels (cosine >= threshold) are emitted
  as tokens that ALL share position 0 (`increment` is 1 for the first
  prediction and 0 for the rest, ``classification_stream.cpp:255-268``).
- ``nearest_neighbors``: each source token is replaced by its top-k
  nearest vocabulary words, all sharing the source token's position
  (``nearest_neighbors_stream.cpp:234-256``). Out-of-vocabulary tokens
  emit nothing (divergence: fastText would back off to subword vectors).

Options mirror ``REGISTER_ANALYZER_JSON``: ``model_location``,
``top_k``, ``threshold`` (classification only).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from iresearch_ray.analysis.analyzers import Analyzer, SegmentationAnalyzer


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer — turns (hash, counter) pairs
    into well-mixed uint64 streams."""
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash_vectors(words: np.ndarray, dim: int, seed: int = 7) -> np.ndarray:
    """Deterministic random-indexing vectors, fully vectorized: per-word
    content hash (columnar kernel) -> counter-based SplitMix64 streams
    -> Box-Muller Gaussians. No per-word Python loop, no RNG objects."""
    import pyarrow as _pa

    from iresearch_ray.pipelines.dedup import _hash_strings

    base = _hash_strings(_pa.array([str(w) for w in words],
                                   type=_pa.string())) ^ np.uint64(seed)
    # two uniform streams per output dim (Box-Muller needs pairs)
    ctr = np.arange(2 * dim, dtype=np.uint64)[None, :]
    bits = _splitmix64(base[:, None] * np.uint64(0x9E3779B97F4A7C15) + ctr)
    u = (bits >> np.uint64(11)).astype(np.float64) * (2.0 ** -53)
    u1 = np.clip(u[:, :dim], 1e-12, 1.0)
    u2 = u[:, dim:]
    out = (np.sqrt(-2.0 * np.log(u1))
           * np.cos(2.0 * np.pi * u2)).astype(np.float32)
    norms = np.linalg.norm(out, axis=1, keepdims=True)
    return out / np.maximum(norms, 1e-12)


@dataclass
class WordEmbeddingModel:
    """vocab (byte-sorted), unit vectors (V, D); optional labels with
    unit centroid vectors (L, D)."""

    vocab: np.ndarray
    vectors: np.ndarray
    labels: np.ndarray | None = None
    label_vecs: np.ndarray | None = None

    def save(self, path: str) -> None:
        data = {"vocab": self.vocab.astype(str), "vectors": self.vectors}
        if self.labels is not None:
            data["labels"] = self.labels.astype(str)
            data["label_vecs"] = self.label_vecs
        np.savez(path, **data)

    @classmethod
    def load(cls, path: str) -> "WordEmbeddingModel":
        z = np.load(path, allow_pickle=False)
        return cls(
            vocab=z["vocab"].astype(str),
            vectors=np.ascontiguousarray(z["vectors"], dtype=np.float32),
            labels=z["labels"].astype(str) if "labels" in z else None,
            label_vecs=(np.ascontiguousarray(z["label_vecs"], np.float32)
                        if "label_vecs" in z else None),
        )

    def lookup(self, terms: np.ndarray) -> np.ndarray:
        """vocab row per term, -1 for OOV (two vectorized searchsorted
        compares over the sorted vocabulary)."""
        idx = np.searchsorted(self.vocab, terms)
        idx[idx >= self.vocab.size] = self.vocab.size - 1 if self.vocab.size else 0
        ok = self.vocab.size > 0
        hit = ok & (self.vocab[idx] == terms)
        return np.where(hit, idx, -1).astype(np.int64)

    @classmethod
    def fit(cls, texts, labels=None, dim: int = 32,
            min_count: int = 1, seed: int = 7,
            analyzer: Analyzer | None = None) -> "WordEmbeddingModel":
        """Build a model from a corpus: random-indexing word vectors
        over the tokenized vocabulary; with ``labels`` (one per text),
        label centroids = unit mean of the label's document vectors
        (the nearest-centroid / Rocchio form of fastText's supervised
        linear head)."""
        an = analyzer or SegmentationAnalyzer()
        arr = texts if isinstance(texts, pa.Array) else pa.array(
            list(texts), type=pa.string())
        d, t, _ = an.tokenize(arr)
        terms = np.asarray(t.to_pylist(), dtype=object).astype(str)
        vocab, counts = np.unique(terms, return_counts=True)
        vocab = vocab[counts >= min_count]
        vecs = _hash_vectors(vocab, dim, seed)
        model = cls(vocab=vocab, vectors=vecs)
        if labels is not None:
            lab = np.asarray(list(labels)).astype(str)
            rows = model.lookup(terms)
            ok = rows >= 0
            dvec = np.zeros((len(arr), dim), dtype=np.float32)
            np.add.at(dvec, d[ok].astype(np.int64), vecs[rows[ok]])
            n = np.linalg.norm(dvec, axis=1, keepdims=True)
            dvec /= np.maximum(n, 1e-12)
            names = np.unique(lab)
            cents = np.stack([dvec[lab == name].mean(axis=0)
                              for name in names])
            n = np.linalg.norm(cents, axis=1, keepdims=True)
            model.labels = names
            model.label_vecs = (cents / np.maximum(n, 1e-12)).astype(np.float32)
        return model


def _load_model(model) -> WordEmbeddingModel:
    if isinstance(model, WordEmbeddingModel):
        return model
    return WordEmbeddingModel.load(model)


@dataclass
class ClassificationAnalyzer(Analyzer):
    """Emit the document's top-k predicted labels as tokens at
    position 0 (``classification_stream.cpp``: increment 1 for the
    first prediction, 0 afterwards)."""

    model_location: str | WordEmbeddingModel = ""
    top_k: int = 1
    threshold: float = 0.0
    _model: WordEmbeddingModel | None = field(default=None, repr=False)

    def _m(self) -> WordEmbeddingModel:
        if self._model is None:
            self._model = _load_model(self.model_location)
            if self._model.label_vecs is None:
                raise ValueError("classification model has no labels")
        return self._model

    def doc_scores(self, texts: pa.Array) -> np.ndarray:
        """(n_docs, n_labels) cosine scores — the vectorized
        ``predictLine`` core, shared by tokenize()."""
        m = self._m()
        d, t, _ = SegmentationAnalyzer().tokenize(texts)
        terms = np.asarray(t.to_pylist(), dtype=object).astype(str)
        rows = m.lookup(terms)
        ok = rows >= 0
        dvec = np.zeros((len(texts), m.vectors.shape[1]), dtype=np.float32)
        np.add.at(dvec, d[ok].astype(np.int64), m.vectors[rows[ok]])
        n = np.linalg.norm(dvec, axis=1, keepdims=True)
        dvec /= np.maximum(n, 1e-12)
        return dvec @ m.label_vecs.T

    def tokenize(self, texts: pa.Array):
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        m = self._m()
        scores = self.doc_scores(texts)
        k = min(self.top_k, scores.shape[1])
        top = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        rowi = np.arange(scores.shape[0])[:, None]
        sel = scores[rowi, top]
        order = np.argsort(-sel, axis=1, kind="stable")
        top = top[rowi, order]
        sel = sel[rowi, order]
        keep = sel >= self.threshold
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int32),
                            keep.sum(axis=1))
        labels = m.labels[top[keep]]
        terms = pa.array(labels.astype(str), type=pa.string())
        # all predictions share position 0 (inc 1, then 0s)
        pos = np.zeros(doc_idx.size, dtype=np.int32)
        return doc_idx, terms, pos

    def tokenize_query(self, text: str) -> list[str]:
        _, terms, _ = self.tokenize(pa.array([text], type=pa.string()))
        return terms.to_pylist()


@dataclass
class NearestNeighborsAnalyzer(Analyzer):
    """Replace each source token with its top-k nearest vocabulary
    words (cosine over the unit vectors); the k neighbors share the
    source token's position (``nearest_neighbors_stream.cpp``:
    increment 1 for the first neighbor of each token, 0 afterwards)."""

    model_location: str | WordEmbeddingModel = ""
    top_k: int = 1
    _model: WordEmbeddingModel | None = field(default=None, repr=False)

    def _m(self) -> WordEmbeddingModel:
        if self._model is None:
            self._model = _load_model(self.model_location)
        return self._model

    def tokenize(self, texts: pa.Array):
        import pyarrow.compute as pc

        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        m = self._m()
        d, t, p = SegmentationAnalyzer().tokenize(texts)
        # NN once per DISTINCT token, then broadcast to occurrences
        dict_arr = pc.dictionary_encode(t)
        if isinstance(dict_arr, pa.ChunkedArray):
            dict_arr = dict_arr.combine_chunks()
        uniq = np.asarray(dict_arr.dictionary.to_pylist(),
                          dtype=object).astype(str)
        codes = dict_arr.indices.to_numpy(zero_copy_only=False)
        rows = m.lookup(uniq)
        ok = rows >= 0
        k = min(self.top_k, max(0, m.vocab.size - 1))
        nn = np.full((uniq.size, k), -1, dtype=np.int64)
        if ok.any() and k:
            sims = m.vectors[rows[ok]] @ m.vectors.T  # (U, V)
            # top k+1 then drop the word itself
            kk = min(k + 1, m.vocab.size)
            cand = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
            ri = np.arange(cand.shape[0])[:, None]
            csims = sims[ri, cand]
            order = np.argsort(-csims, axis=1, kind="stable")
            cand = cand[ri, order]
            not_self = cand != rows[ok][:, None]
            # keep first k non-self per row (vectorized rank-filter)
            rank = np.cumsum(not_self, axis=1) - 1
            take = not_self & (rank < k)
            flat_rows = np.repeat(np.flatnonzero(ok), take.sum(axis=1))
            nn_flat = cand[take]
            slot = np.concatenate(
                [np.arange(c) for c in take.sum(axis=1)]) \
                if take.size else np.empty(0, np.int64)
            nn[flat_rows, slot] = nn_flat
        # expand occurrences: token i -> its k neighbors at position p[i]
        occ_nn = nn[codes]                       # (n_occ, k)
        valid = occ_nn >= 0
        counts = valid.sum(axis=1).astype(np.int64)
        doc_idx = np.repeat(d, counts).astype(np.int32, copy=False)
        pos = np.repeat(p, counts).astype(np.int32, copy=False)
        terms = pa.array(m.vocab[occ_nn[valid]].astype(str),
                         type=pa.string())
        return doc_idx, terms, pos

    def tokenize_query(self, text: str) -> list[str]:
        _, terms, _ = self.tokenize(pa.array([text], type=pa.string()))
        return terms.to_pylist()
