"""Real-20-Newsgroups behavioral gate (reference notebook cells 17-25).

These tests run the published ARI/AMI evaluation the moment the dataset exists
offline (see enstop_tpu.datasets docstring) and skip cleanly otherwise — the
code path itself (loader round-trip + evaluation wiring) is always tested on a
synthetic stand-in.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from conftest import make_corpus
from enstop_tpu.datasets import (
    load_20newsgroups_counts,
    save_20newsgroups_npz,
)


def _real_data_available():
    try:
        load_20newsgroups_counts()
        return True
    except RuntimeError:
        return False


def test_npz_roundtrip(tmp_path, rng):
    X = sp.csr_matrix(make_corpus(rng, seed=31).astype(np.int64))
    labels = rng.randint(0, 5, X.shape[0])
    vocab = np.array([f"w{i}" for i in range(X.shape[1])])
    p = tmp_path / "corpus.npz"
    save_20newsgroups_npz(p, X, labels, vocab)
    X2, labels2, vocab2 = load_20newsgroups_counts(local_npz=str(p))
    assert (X2 != X).nnz == 0
    np.testing.assert_array_equal(labels2, labels)
    np.testing.assert_array_equal(vocab2, vocab)


def test_loader_error_is_actionable(tmp_path, monkeypatch):
    monkeypatch.delenv("ENSTOP_TPU_20NG_NPZ", raising=False)
    with pytest.raises(RuntimeError, match="save_20newsgroups_npz"):
        load_20newsgroups_counts(data_home=str(tmp_path / "empty"))


def test_env_var_source(tmp_path, rng, monkeypatch):
    X = sp.csr_matrix(make_corpus(rng, seed=32).astype(np.int64))
    p = tmp_path / "c.npz"
    save_20newsgroups_npz(p, X, np.zeros(X.shape[0], np.int64))
    monkeypatch.setenv("ENSTOP_TPU_20NG_NPZ", str(p))
    X2, _, _ = load_20newsgroups_counts()
    assert X2.shape == X.shape


@pytest.mark.skipif(not _real_data_available(), reason="20NG not available offline")
def test_real_20ng_plsa_quality_gate():
    """PLSA at k=20 on real 20NG must reach the reference's published ballpark
    (ARI 0.2764 / AMI 0.4341, BASELINE.md) within a generous margin — topic
    model quality varies run to run, so the gate is >= 70% of published."""
    from sklearn.metrics import adjusted_mutual_info_score, adjusted_rand_score

    from enstop_tpu import PLSA

    X, labels, _ = load_20newsgroups_counts()
    model = PLSA(n_components=20, random_state=42).fit(X)
    pred = np.argmax(model.embedding_, axis=1)
    ari = adjusted_rand_score(labels, pred)
    ami = adjusted_mutual_info_score(labels, pred)
    assert ari >= 0.7 * 0.2764, f"ARI {ari:.4f} below gate"
    assert ami >= 0.7 * 0.4341, f"AMI {ami:.4f} below gate"
