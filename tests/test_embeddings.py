"""classification / nearest_neighbors analyzers (fastText-shaped model:
sorted vocab + unit vectors + label centroids in one .npz)."""

import numpy as np
import pyarrow as pa


def _toy_model(tmp_path=None):
    from iresearch_ray.analysis.embeddings import WordEmbeddingModel

    # hand-built vectors with KNOWN neighbor structure
    vocab = np.array(["auto", "car", "dog", "hound", "train"])
    vecs = np.array([
        [1.0, 0.02, 0.0],   # auto ~ car
        [1.0, 0.00, 0.0],   # car
        [0.0, 1.00, 0.0],   # dog ~ hound
        [0.0, 1.00, 0.02],  # hound
        [0.0, 0.00, 1.0],   # train
    ], dtype=np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return WordEmbeddingModel(vocab=vocab, vectors=vecs)


def test_nearest_neighbors_stream_semantics():
    from iresearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("nearest_neighbors",
                      {"model_location": _toy_model(), "top_k": 1})
    d, t, p = an.tokenize(pa.array(["car dog", "unknownword train"]))
    # each token replaced by its single nearest non-self neighbor, at
    # the SOURCE token's position; OOV emits nothing
    assert t.to_pylist() == ["auto", "hound", "hound"]
    assert d.tolist() == [0, 0, 1]
    assert p.tolist() == [0, 1, 1]  # 'train' keeps source position 1

    an2 = get_analyzer("nearest_neighbors",
                       {"model_location": _toy_model(), "top_k": 2})
    d2, t2, p2 = an2.tokenize(pa.array(["dog"]))
    assert t2.to_pylist()[0] == "hound"  # nearest first
    assert p2.tolist() == [0, 0]         # both neighbors share position


def test_classification_roundtrip(tmp_path):
    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.analysis.embeddings import WordEmbeddingModel

    rng = np.random.default_rng(3)
    animals = "dog cat hound terrier kitten pup feline".split()
    vehicles = "car truck auto van sedan engine wheel".split()
    texts, labels = [], []
    for _ in range(120):
        lab = rng.choice(["animal", "vehicle"])
        pool = animals if lab == "animal" else vehicles
        texts.append(" ".join(rng.choice(pool, size=6)))
        labels.append(lab)
    model = WordEmbeddingModel.fit(texts, labels, dim=16)
    path = str(tmp_path / "model.npz")
    model.save(path)

    an = get_analyzer("classification",
                      {"model_location": path, "top_k": 1})
    d, t, p = an.tokenize(pa.array(
        ["hound kitten cat", "sedan truck engine", "dog dog pup"]))
    assert t.to_pylist() == ["animal", "vehicle", "animal"]
    assert p.tolist() == [0, 0, 0]  # predictions all at position 0
    assert d.tolist() == [0, 1, 2]

    # top_k=2 emits both labels, best first, still position 0
    an2 = get_analyzer("classification",
                       {"model_location": path, "top_k": 2,
                        "threshold": -1.0})
    d2, t2, p2 = an2.tokenize(pa.array(["hound kitten"]))
    assert t2.to_pylist()[0] == "animal" and set(t2.to_pylist()) == {
        "animal", "vehicle"}
    assert p2.tolist() == [0, 0]

    # threshold filters low-confidence predictions
    an3 = get_analyzer("classification",
                       {"model_location": path, "top_k": 2,
                        "threshold": 0.99})
    d3, t3, _ = an3.tokenize(pa.array(["hound kitten"]))
    assert len(t3) <= 1


def test_classification_indexes_and_searches(tmp_path, ray_session):
    """End-to-end: label tokens are indexable and term-searchable."""
    import iresearch_ray
    from iresearch_ray.analysis.embeddings import WordEmbeddingModel
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    texts = ["dog hound dog", "car auto sedan"] * 40
    labels = ["animal", "vehicle"] * 40
    model = WordEmbeddingModel.fit(texts, labels, dim=8)
    path = str(tmp_path / "m.npz")
    model.save(path)
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    })
    import ray.data

    idx = str(tmp_path / "idx")
    iresearch_ray.build_index(
        ray.data.from_arrow(tbl), idx, text_col="text",
        key_cols=("doc_id",), stored_cols=("doc_id",),
        analyzer="classification",
        analyzer_options={"model_location": path, "top_k": 1},
        segment_docs=32)
    s = IndexSearcher(idx)
    hits = s.fetch_stored(s.match_docs(F.Term("animal")), ("doc_id",))
    got = sorted(int(x) for x in hits["doc_id"])
    assert got == sorted(range(0, len(texts), 2))
