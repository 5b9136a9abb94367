"""Reproduction of the reference's 20-Newsgroups evaluation notebook
(notebooks/EnsTop with 20-Newsgroups.ipynb): fit PLSA, EnsembleTopics, sklearn
LDA and sklearn NMF on the same corpus; score document clusters (argmax topic)
against ground-truth labels with ARI/AMI; report wall times.

Uses real 20-Newsgroups when a cached copy is available (this build environment
has no network), otherwise a seeded synthetic corpus with the same shape and
known topic structure (enstop_tpu.synthetic).

Run:  python examples/topic_model_comparison.py [--small] [--skip-sklearn]
"""

import argparse
import sys
import time

import numpy as np
from sklearn.metrics import adjusted_mutual_info_score, adjusted_rand_score

sys.path.insert(0, ".")
sys.path.insert(0, "examples")
from _common import ensure_responsive_backend

ensure_responsive_backend()


def load_corpus(small=False):
    try:
        from sklearn.datasets import fetch_20newsgroups
        from sklearn.feature_extraction.text import CountVectorizer

        news = fetch_20newsgroups(subset="all", download_if_missing=False)
        X = CountVectorizer(min_df=5, stop_words="english").fit_transform(news.data)
        return X.astype(np.float32), np.asarray(news.target), "20-newsgroups"
    except Exception:
        from enstop_tpu.synthetic import synthetic_corpus, twenty_newsgroups_shape

        if small:
            X, y = synthetic_corpus(n_docs=2000, n_words=8000, n_topics=20,
                                    tokens_per_doc=150, seed=0)
        else:
            X, y = twenty_newsgroups_shape(seed=0)
        return X, y, "synthetic-20ng-shape"


def score(name, labels, embedding, wall):
    pred = np.argmax(embedding, axis=1)
    ari = adjusted_rand_score(labels, pred)
    ami = adjusted_mutual_info_score(labels, pred)
    print(f"{name:24s}  wall {wall:7.1f}s   ARI {ari:.4f}   AMI {ami:.4f}")
    return ari, ami


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--skip-sklearn", action="store_true")
    args = ap.parse_args()

    X, labels, source = load_corpus(args.small)
    print(f"corpus: {source}  docs={X.shape[0]} vocab={X.shape[1]} nnz={X.nnz}")

    from enstop_tpu import PLSA, EnsembleTopics

    t0 = time.time()
    plsa = PLSA(n_components=20, n_iter=100, random_state=0)
    emb = plsa.fit_transform(X)
    score("PLSA (TPU)", labels, emb, time.time() - t0)
    print(
        f"  (device-side EM: {plsa.fit_info_['wall_time_s']:.2f}s for "
        f"{plsa.n_iter_} iters — first-model wall includes one-off XLA/Mosaic "
        "compilation, cached for subsequent fits)"
    )

    t0 = time.time()
    ens = EnsembleTopics(n_components=20, n_starts=16, random_state=0)
    emb = ens.fit_transform(X)
    w = time.time() - t0
    score(f"EnsembleTopics (k*={ens.n_components_})", labels, emb, w)
    print(f"  mean coherence: {ens.coherence():.3f}   mean log-lift: {ens.log_lift():.3f}")

    if not args.skip_sklearn:
        from sklearn.decomposition import NMF, LatentDirichletAllocation

        t0 = time.time()
        lda = LatentDirichletAllocation(n_components=20, random_state=0)
        emb = lda.fit_transform(X)
        score("sklearn LDA", labels, emb, time.time() - t0)

        t0 = time.time()
        nmf = NMF(n_components=20, beta_loss="kullback-leibler", solver="mu",
                  init="nndsvda", random_state=0, max_iter=200)
        emb = nmf.fit_transform(X)
        score("sklearn NMF (KL, mu)", labels, emb, time.time() - t0)


if __name__ == "__main__":
    main()
