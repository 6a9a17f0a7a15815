"""Native C++ window sweep: build (if toolchain present) + parity vs numpy.

The .so is built on demand into sert_tpu/native/ — the repo stays
source-only. If g++ is unavailable the tests skip (the numpy path is the
reference and always tested in test_data.py).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from sert_tpu.data.windows import extract_windows
from sert_tpu.native import loader


@pytest.fixture(scope="module")
def native():
    # maybe_load() now compiles on first use (missing or stale .so);
    # build.sh remains the manual fallback for odd toolchains.
    if loader.maybe_load() is None:
        if shutil.which("g++") is None:
            pytest.skip("no g++ available")
        build = os.path.join(os.path.dirname(loader.lib_path()), "build.sh")
        subprocess.run(["sh", build], check=True, capture_output=True)
        loader._load_attempted = False  # retry after build
        loader._cached = None
    lib = loader.maybe_load()
    if lib is None:
        pytest.skip("native lib failed to load")
    return lib


def test_autobuild_from_clean(tmp_path, monkeypatch):
    """A fresh checkout (no .so) must build on first maybe_load() —
    otherwise every new environment silently runs the slow Python
    prepare. Exercised by moving the built lib aside and resetting the
    loader cache; restored afterward either way."""
    if shutil.which("g++") is None:
        pytest.skip("no g++ available")
    path = loader.lib_path()
    aside = str(tmp_path / "aside.so")
    monkeypatch.setattr(loader, "_load_attempted", False)
    monkeypatch.setattr(loader, "_cached", None)
    had = os.path.exists(path)
    if had:
        os.replace(path, aside)
    try:
        lib = loader.maybe_load()
        assert lib is not None and os.path.exists(path)
        assert getattr(lib, "has_text", False)
    finally:
        if not os.path.exists(path) and had:
            os.replace(aside, path)
        loader._load_attempted = False
        loader._cached = None


def test_autobuild_disabled_by_env(tmp_path, monkeypatch):
    monkeypatch.setenv("SERT_NO_NATIVE_BUILD", "1")
    monkeypatch.setattr(loader, "_load_attempted", False)
    monkeypatch.setattr(loader, "_cached", None)
    path = loader.lib_path()
    aside = str(tmp_path / "aside.so")
    had = os.path.exists(path)
    if had:
        os.replace(path, aside)
    try:
        assert loader.maybe_load() is None
    finally:
        if had:
            os.replace(aside, path)
        loader._load_attempted = False
        loader._cached = None


CASES = [
    (list(range(10)), [3], 4, 1),
    (list(range(10)), [3, 7], 4, 2),
    ([5, 6], [1, 2], 4, 1),           # short doc -> padded
    ([], [1], 4, 1),                  # empty doc
    (list(range(100)), [], 5, 1),     # no entities
    (list(range(257)), [0, 1, 2], 8, 3),
]


class TestNativeParity:
    @pytest.mark.parametrize("tokens,ents,w,stride", CASES)
    def test_matches_numpy(self, native, tokens, ents, w, stride):
        got = native.extract_windows(tokens, ents, w, stride)
        want = extract_windows(tokens, ents, w, stride)
        for g, x in zip(got, want):
            np.testing.assert_array_equal(g, x)

    def test_random_fuzz(self, native):
        rng = np.random.default_rng(0)
        for _ in range(50):
            n_tok = int(rng.integers(0, 60))
            n_ent = int(rng.integers(0, 4))
            w = int(rng.integers(2, 12))
            stride = int(rng.integers(1, 4))
            tokens = rng.integers(0, 1000, size=n_tok).tolist()
            ents = rng.integers(0, 50, size=n_ent).tolist()
            got = native.extract_windows(tokens, ents, w, stride)
            want = extract_windows(tokens, ents, w, stride)
            for g, x in zip(got, want):
                np.testing.assert_array_equal(g, x)

    def test_batch_matches_per_doc(self, native):
        rng = np.random.default_rng(1)
        docs, ents_per_doc = [], []
        for _ in range(20):
            docs.append(rng.integers(0, 500, size=int(rng.integers(0, 40))))
            ents_per_doc.append(rng.integers(0, 30, size=int(rng.integers(0, 3))))
        tokens = np.concatenate([d for d in docs]) if docs else np.zeros(0, np.int32)
        doc_off = np.cumsum([0] + [len(d) for d in docs]).astype(np.int64)
        ents = (np.concatenate([e for e in ents_per_doc])
                if ents_per_doc else np.zeros(0, np.int32))
        ent_off = np.cumsum([0] + [len(e) for e in ents_per_doc]).astype(np.int64)

        got_w, got_l, got_e = native.extract_windows_batch(
            tokens, doc_off, ents, ent_off, window_size=6, stride=2)

        parts = [extract_windows(d.tolist(), e.tolist(), 6, 2)
                 for d, e in zip(docs, ents_per_doc)]
        want_w = np.concatenate([p[0] for p in parts])
        want_l = np.concatenate([p[1] for p in parts])
        want_e = np.concatenate([p[2] for p in parts])
        np.testing.assert_array_equal(got_w, want_w)
        np.testing.assert_array_equal(got_l, want_l)
        np.testing.assert_array_equal(got_e, want_e)

    def test_text_counter_and_encode_parity(self, native):
        if not getattr(native, "has_text", False):
            pytest.skip("stale .so without the text API")
        from collections import Counter
        from sert_tpu.data.tokenize import tokenize
        from sert_tpu.data.vocab import Vocabulary
        texts = ["Hello, the World! it's o'brien's 42 code; Résumé",
                 "the THE cat 007 a1 'quoted' and   spaces\ttabs\nnewlines",
                 # Unicode chars whose str.lower() maps into ASCII: the
                 # wrapper must lowercase in Python before the byte scanner
                 "25K warmer İstanbul trip"]
        for lc in (True, False):
            for dn in (True, False):
                want = Counter()
                for t in texts:
                    want.update(tokenize(t, lowercase=lc, drop_numeric=dn))
                c = native.make_counter(lowercase=lc, drop_numeric=dn)
                for t in texts:
                    c.add(t)
                assert c.counts() == dict(want)
        v = Vocabulary.build([tokenize(t) for t in texts], min_count=1)
        nv = native.make_vocab(list(v.iter_terms()))
        for t in texts + ["zzz unseen", ""]:
            assert nv.encode(t).tolist() == v.encode(tokenize(t))

    def test_prepare_native_text_identical(self, native, tmp_path):
        """prepare with the C++ text pipeline must emit byte-identical
        artifacts to the pure-Python path."""
        if not getattr(native, "has_text", False):
            pytest.skip("stale .so without the text API")
        from sert_tpu.data import Associations, EntityRegistry, InstanceDataset
        from sert_tpu.data.prepare import prepare
        from sert_tpu.data.synthetic import make_synthetic
        from sert_tpu.data.vocab import Vocabulary
        from sert_tpu.utils.config import DataConfig

        col = make_synthetic(num_entities=6, vocab_size=250, docs_per_entity=3,
                             doc_len=30, num_topics=3, seed=4)
        reg = EntityRegistry(col.entities)
        assoc = Associations()
        for d, es in col.doc_entities.items():
            for e in es:
                assoc.add(d, reg.id(e))
        cfg = DataConfig(window_size=5, vocab_min_count=1)
        d1, d2 = str(tmp_path / "nat"), str(tmp_path / "py")
        prepare(col.docs, assoc, reg, d1, cfg, use_native=True)
        prepare(col.docs, assoc, reg, d2, cfg, use_native=False)
        va = Vocabulary.load(d1 + "/vocab.json")
        vb = Vocabulary.load(d2 + "/vocab.json")
        assert va.content_hash() == vb.content_hash()
        assert va.counts == vb.counts
        a, _ = next(InstanceDataset(d1).iter_batches(16, epoch=0))
        b, _ = next(InstanceDataset(d2).iter_batches(16, epoch=0))
        np.testing.assert_array_equal(a["windows"], b["windows"])
        np.testing.assert_array_equal(a["entities"], b["entities"])

    def test_prepare_uses_native(self, native, tmp_path):
        """prepare(use_native=True) must produce byte-identical shards to the
        numpy path."""
        from sert_tpu.data import Associations, EntityRegistry, InstanceDataset
        from sert_tpu.data.prepare import prepare
        from sert_tpu.data.synthetic import make_synthetic
        from sert_tpu.utils.config import DataConfig

        col = make_synthetic(num_entities=6, vocab_size=200, docs_per_entity=3,
                             doc_len=30, num_topics=3, seed=2)
        reg = EntityRegistry(col.entities)
        assoc = Associations()
        for d, es in col.doc_entities.items():
            for e in es:
                assoc.add(d, reg.id(e))
        cfg = DataConfig(window_size=5, vocab_min_count=1)
        d1, d2 = str(tmp_path / "native"), str(tmp_path / "numpy")
        prepare(col.docs, assoc, reg, d1, cfg, use_native=True)
        prepare(col.docs, assoc, reg, d2, cfg, use_native=False)
        a = InstanceDataset(d1)
        b = InstanceDataset(d2)
        assert a.meta["num_instances"] == b.meta["num_instances"]
        ba, _ = next(a.iter_batches(32, epoch=0))
        bb, _ = next(b.iter_batches(32, epoch=0))
        np.testing.assert_array_equal(ba["windows"], bb["windows"])
        np.testing.assert_array_equal(ba["entities"], bb["entities"])


class TestSourceSync:
    def test_stopword_lists_identical(self):
        """kStopwords in text.cc must equal tokenize.STOPWORDS exactly — an
        edit to either list would silently desynchronize the native and
        Python tokenizers (the parity tests' generated vocabularies contain
        few stopwords, so they would stay green)."""
        import re

        from sert_tpu.data.tokenize import STOPWORDS
        src = open(os.path.join(os.path.dirname(loader.lib_path()),
                                "text.cc")).read()
        m = re.search(r"kStopwords\[\]\s*=\s*\{(.*?)\};", src, re.S)
        assert m, "kStopwords array not found in text.cc"
        cc_words = set(re.findall(r'"((?:[^"\\]|\\.)*)"', m.group(1)))
        cc_words = {w.replace("\\'", "'") for w in cc_words}
        assert cc_words == set(STOPWORDS), (
            sorted(cc_words ^ set(STOPWORDS)))


class TestConfigValidation:
    def test_bad_stride_rejected_at_config(self):
        """stride=0 must fail at DataConfig construction: the native sweep
        divides by stride in C++ (uncatchable SIGFPE) and the numpy path
        diverges — neither may ever see it."""
        from sert_tpu.utils.config import DataConfig
        with pytest.raises(ValueError, match="stride"):
            DataConfig(stride=0)
        with pytest.raises(ValueError, match="stride"):
            DataConfig(stride=-1)
        with pytest.raises(ValueError, match="window_size"):
            DataConfig(window_size=0)
