"""Notebook-parity evaluation on REAL 20-Newsgroups (the reference's de-facto
integration test: notebooks/EnsTop with 20-Newsgroups.ipynb, cells 17-25).

Runs the moment offline data exists (see enstop_tpu.datasets): fits PLSA and
EnsembleTopics at k=20, clusters documents by argmax topic, and scores ARI/AMI
against the newsgroup labels.  Published reference numbers (BASELINE.md):

    pLSA    ARI 0.2764 / AMI 0.4341
    EnsTop  ARI 0.3368 / AMI 0.4784

Usage:  python scripts/eval_20ng.py [--npz PATH] [--data-home DIR] [--quick]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", default=None, help=".npz bundle path")
    ap.add_argument("--data-home", default=None, help="sklearn cache dir")
    ap.add_argument("--quick", action="store_true",
                    help="PLSA only (skip the ensemble)")
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from sklearn.metrics import adjusted_mutual_info_score, adjusted_rand_score

    from enstop_tpu import PLSA, EnsembleTopics
    from enstop_tpu.datasets import load_20newsgroups_counts

    X, labels, _ = load_20newsgroups_counts(local_npz=args.npz,
                                            data_home=args.data_home)
    print(f"# 20NG loaded: {X.shape[0]} docs x {X.shape[1]} words, nnz={X.nnz}",
          file=sys.stderr)

    results = {}

    t0 = time.time()
    plsa = PLSA(n_components=args.k, random_state=42).fit(X)
    plsa_wall = time.time() - t0
    pred = np.argmax(plsa.embedding_, axis=1)
    results["plsa"] = {
        "ari": round(float(adjusted_rand_score(labels, pred)), 4),
        "ami": round(float(adjusted_mutual_info_score(labels, pred)), 4),
        "wall_s": round(plsa_wall, 2),
        "reference": {"ari": 0.2764, "ami": 0.4341, "wall_s": 14.7},
    }

    if not args.quick:
        t0 = time.time()
        ens = EnsembleTopics(n_components=args.k, n_starts=16,
                             random_state=42).fit(X)
        ens_wall = time.time() - t0
        pred = np.argmax(ens.embedding_, axis=1)
        results["ensemble"] = {
            "ari": round(float(adjusted_rand_score(labels, pred)), 4),
            "ami": round(float(adjusted_mutual_info_score(labels, pred)), 4),
            "n_components_": int(ens.n_components_),
            "wall_s": round(ens_wall, 2),
            "reference": {"ari": 0.3368, "ami": 0.4784, "wall_s": 183.0},
        }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
