"""Dataset loading hooks for the reference's de-facto integration benchmark.

The reference's behavioral gold standard is the committed 20-Newsgroups notebook
(``/root/reference/notebooks/EnsTop with 20-Newsgroups.ipynb``: ``subset='all'``,
``CountVectorizer(min_df=5, stop_words='english')``, k=20, published ARI/AMI —
BASELINE.md).  This environment has no network access, so the loader accepts the
data from any of three *offline* sources, in priority order:

1. an explicit ``.npz`` bundle (``local_npz=``, or ``$ENSTOP_TPU_20NG_NPZ``) with
   arrays ``data/indices/indptr/shape`` (CSR counts) and ``labels``;
2. a pre-populated sklearn cache directory (``data_home=``, or sklearn's default
   ``~/scikit_learn_data``) — ``fetch_20newsgroups(download_if_missing=False)``;
3. nothing available -> a clear error telling the caller how to provide data.

``scripts/eval_20ng.py`` runs the full notebook-parity evaluation the moment one
of these sources exists; ``tests/test_real_20ng.py`` runs it under pytest and
skips cleanly when no data is present.
"""

from __future__ import annotations

import os

import numpy as np
import scipy.sparse as sp

__all__ = ["load_20newsgroups_counts", "save_20newsgroups_npz", "NPZ_ENV_VAR"]

NPZ_ENV_VAR = "ENSTOP_TPU_20NG_NPZ"


def save_20newsgroups_npz(path, X, labels, vocabulary=None):
    """Bundle a vectorized 20NG corpus into the ``.npz`` layout the loader reads.

    Run this once on any machine that CAN fetch the dataset, then ship the file.
    """
    X = sp.csr_matrix(X)
    payload = {
        "data": X.data,
        "indices": X.indices,
        "indptr": X.indptr,
        "shape": np.asarray(X.shape, dtype=np.int64),
        "labels": np.asarray(labels),
    }
    if vocabulary is not None:
        payload["vocabulary"] = np.asarray(vocabulary)
    np.savez_compressed(path, **payload)


def _load_npz(path):
    with np.load(path, allow_pickle=False) as z:
        X = sp.csr_matrix(
            (z["data"], z["indices"], z["indptr"]), shape=tuple(z["shape"])
        )
        labels = z["labels"]
        vocab = z["vocabulary"] if "vocabulary" in z else None
    return X, labels, vocab


def _load_sklearn_cache(data_home, min_df, stop_words):
    from sklearn.datasets import fetch_20newsgroups
    from sklearn.feature_extraction.text import CountVectorizer

    news = fetch_20newsgroups(
        subset="all", data_home=data_home, download_if_missing=False
    )
    # the notebook's exact vectorization (cell 4): min_df=5, english stop words
    cv = CountVectorizer(min_df=min_df, stop_words=stop_words)
    X = cv.fit_transform(news.data)
    vocab = np.asarray(cv.get_feature_names_out())
    return sp.csr_matrix(X), np.asarray(news.target), vocab


def load_20newsgroups_counts(local_npz=None, data_home=None, min_df=5,
                             stop_words="english"):
    """Load the 20-Newsgroups count matrix + labels from offline sources.

    Returns ``(X_csr, labels, vocabulary_or_None)``.  Raises ``RuntimeError``
    with setup instructions when no source is available.
    """
    candidates = [local_npz, os.environ.get(NPZ_ENV_VAR)]
    for path in candidates:
        if path and os.path.exists(path):
            return _load_npz(path)

    try:
        return _load_sklearn_cache(data_home, min_df, stop_words)
    except Exception:
        pass

    raise RuntimeError(
        "20-Newsgroups data is not available offline. Provide it either as\n"
        "  (a) an .npz bundle (make one with enstop_tpu.datasets."
        "save_20newsgroups_npz on a networked machine) passed via local_npz= "
        "or ${}, or\n"
        "  (b) a pre-populated sklearn cache dir passed via data_home= "
        "(populate with sklearn.datasets.fetch_20newsgroups(subset='all')).".format(
            NPZ_ENV_VAR
        )
    )
