"""Small-scale exact HDBSCAN for stable-topic clustering.

The reference depends on the hdbscan package (Cython internals ``mst_linkage_core``,
``label``, ``_tree_to_labels`` — enstop_.py:21-23) to cluster the ensemble's topic
vectors.  This is a self-contained reimplementation of the full pipeline for the
sizes that arise there (N = n_runs · k points, typically a few hundred):

    pairwise distances -> core distances -> mutual reachability ->
    MST (dense Prim) -> single-linkage tree -> condensed tree (min_cluster_size) ->
    stability -> cluster selection ("leaf" or "eom", allow_single_cluster) ->
    labels + membership probabilities

Everything is numpy; the O(N^2) steps are trivial at this scale.  Semantics follow
the hdbscan package (condense/stability/leaf selection as in hdbscan's
``condense_tree`` / ``compute_stability`` / ``get_clusters``) so the ensemble
combiners (enstop_.py:266-414) behave like the reference's.
"""

from __future__ import annotations

import numpy as np

__all__ = ["HDBSCAN", "hdbscan_labels", "mutual_reachability", "mst_linkage", "single_linkage_tree"]


def core_distances(dist, min_samples):
    """Distance to the min_samples-th neighbor, self included at rank 0 — the
    convention of the reference's hand-built KL combiner (enstop_.py:288)."""
    k = min(min_samples, dist.shape[0] - 1)
    return np.sort(dist, axis=1)[:, k]


def mutual_reachability(dist, min_samples):
    core = core_distances(dist, min_samples)
    return np.maximum(np.maximum(dist, core[:, None]), core[None, :])


def mst_linkage(mreach):
    """Dense Prim's MST over the mutual-reachability graph.

    Returns edges (a, b, weight) in discovery order (like hdbscan's
    ``mst_linkage_core``); sort by weight before single-linkage.
    """
    n = mreach.shape[0]
    in_tree = np.zeros(n, dtype=bool)
    best = np.full(n, np.inf)
    source = np.zeros(n, dtype=np.intp)
    edges = np.zeros((n - 1, 3))
    current = 0
    in_tree[0] = True
    for it in range(n - 1):
        d = mreach[current]
        update = ~in_tree & (d < best)
        best[update] = d[update]
        source[update] = current
        best_masked = np.where(in_tree, np.inf, best)
        nxt = int(np.argmin(best_masked))
        edges[it] = (source[nxt], nxt, best_masked[nxt])
        in_tree[nxt] = True
        current = nxt
    return edges


def single_linkage_tree(mst_edges):
    """Union-find over weight-sorted MST edges -> scipy-style linkage rows
    (left, right, distance, size), node i's cluster id = n + i."""
    n = mst_edges.shape[0] + 1
    order = np.argsort(mst_edges[:, 2], kind="stable")
    edges = mst_edges[order]
    parent = np.arange(2 * n - 1)
    size = np.ones(2 * n - 1)
    next_label = n
    out = np.zeros((n - 1, 4))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for i in range(n - 1):
        a, b, w = int(edges[i, 0]), int(edges[i, 1]), edges[i, 2]
        ra, rb = find(a), find(b)
        out[i] = (ra, rb, w, size[ra] + size[rb])
        parent[ra] = parent[rb] = next_label
        size[next_label] = size[ra] + size[rb]
        next_label += 1
    return out


def condense_tree(linkage, min_cluster_size):
    """hdbscan-style condensed tree.

    Returns a structured array of rows (parent, child, lambda_val, child_size);
    clusters get labels >= n_points, the root is n_points.
    """
    n = linkage.shape[0] + 1
    root = 2 * n - 2
    rows = []

    def node_members(node):
        # iterative collect of leaves under an internal node
        stack, members = [node], []
        while stack:
            x = stack.pop()
            if x < n:
                members.append(x)
            else:
                stack.append(int(linkage[x - n, 0]))
                stack.append(int(linkage[x - n, 1]))
        return members

    relabel = {root: n}
    next_label = n + 1
    ignore = set()
    # BFS over internal nodes from the root
    bfs = [root]
    idx = 0
    while idx < len(bfs):
        node = bfs[idx]
        idx += 1
        if node in ignore or node < n:
            continue
        left = int(linkage[node - n, 0])
        right = int(linkage[node - n, 1])
        dist = linkage[node - n, 2]
        lam = 1.0 / dist if dist > 0 else np.inf
        lsize = int(linkage[left - n, 3]) if left >= n else 1
        rsize = int(linkage[right - n, 3]) if right >= n else 1
        cur = relabel[node]

        if lsize >= min_cluster_size and rsize >= min_cluster_size:
            relabel[left] = next_label
            rows.append((cur, next_label, lam, lsize))
            next_label += 1
            relabel[right] = next_label
            rows.append((cur, next_label, lam, rsize))
            next_label += 1
            bfs.extend([left, right])
        elif lsize < min_cluster_size and rsize < min_cluster_size:
            for child in (left, right):
                for p in node_members(child):
                    rows.append((cur, p, lam, 1))
                ignore.add(child)
        elif lsize < min_cluster_size:
            relabel[right] = cur
            bfs.append(right)
            for p in node_members(left):
                rows.append((cur, p, lam, 1))
            ignore.add(left)
        else:
            relabel[left] = cur
            bfs.append(left)
            for p in node_members(right):
                rows.append((cur, p, lam, 1))
            ignore.add(right)

    # points that fall out via ignored internal subtrees were emitted directly;
    # single points reached as direct children of surviving nodes:
    ct = np.zeros(len(rows), dtype=[("parent", np.intp), ("child", np.intp),
                                    ("lambda_val", np.float64), ("child_size", np.intp)])
    for i, r in enumerate(rows):
        ct[i] = r
    return ct


def compute_stability(ct):
    """stability[c] = sum over child rows of (lambda - birth_lambda(c)) * size."""
    births = {}
    for r in ct:
        if r["child_size"] > 1 or r["child"] >= ct["parent"].min():
            births.setdefault(r["child"], r["lambda_val"])
    root = int(ct["parent"].min())
    births[root] = 0.0
    stability = {}
    for r in ct:
        c = int(r["parent"])
        birth = births.get(c, 0.0)
        lam = r["lambda_val"]
        if not np.isfinite(lam):
            lam = birth  # infinite lambda contributes nothing extra here
        stability[c] = stability.get(c, 0.0) + (lam - birth) * r["child_size"]
    return stability


def _cluster_children(ct):
    kids = {}
    n_points = int(ct["parent"].min())
    for r in ct:
        if r["child"] >= n_points:
            kids.setdefault(int(r["parent"]), []).append(int(r["child"]))
    return kids


def select_clusters(ct, stability, method="leaf", allow_single_cluster=False):
    root = int(ct["parent"].min())
    kids = _cluster_children(ct)
    all_clusters = set([root]) | {c for cs in kids.values() for c in cs}

    if method == "leaf":
        leaves = sorted(c for c in all_clusters if c not in kids)
        if leaves == [root] and not allow_single_cluster:
            return []
        if not leaves:
            return [root] if allow_single_cluster else []
        if leaves == [root]:
            return [root]
        return [c for c in leaves if c != root or allow_single_cluster]

    # "eom" (excess of mass), bottom-up
    selected = {c: True for c in all_clusters if c != root}
    for c in sorted(all_clusters, reverse=True):
        if c == root:
            continue
        child_stab = sum(stability.get(x, 0.0) for x in kids.get(c, []))
        if kids.get(c) and child_stab > stability.get(c, 0.0):
            selected[c] = False
            stability[c] = child_stab
        elif kids.get(c):
            for x in _descendants(kids, c):
                selected[x] = False
    chosen = [c for c, v in selected.items() if v]
    # keep only top-most chosen (no chosen ancestors)
    result = []
    for c in chosen:
        if not any(a in chosen for a in _ancestors(ct, c) if a != c):
            result.append(c)
    if not result and allow_single_cluster:
        return [root]
    return sorted(result)


def _descendants(kids, c):
    out, stack = [], list(kids.get(c, []))
    while stack:
        x = stack.pop()
        out.append(x)
        stack.extend(kids.get(x, []))
    return out


def _ancestors(ct, c):
    parent_of = {int(r["child"]): int(r["parent"]) for r in ct if r["child_size"] > 1}
    out = []
    while c in parent_of:
        c = parent_of[c]
        out.append(c)
    return out


def labels_and_probabilities(ct, selected, n_points, allow_single_cluster=False):
    selected = set(selected)
    root = n_points
    cluster_ids = {c: i for i, c in enumerate(sorted(selected))}
    labels = np.full(n_points, -1, dtype=np.intp)
    probs = np.zeros(n_points)

    point_rows = ct[ct["child_size"] == 1]
    # lambda at which each cluster's last point leaves (for probability scaling)
    max_lambda = {}
    for r in point_rows:
        c = int(r["parent"])
        lam = r["lambda_val"]
        if np.isfinite(lam):
            max_lambda[c] = max(max_lambda.get(c, 0.0), lam)

    # map each cluster to its selected ancestor (itself if selected)
    parent_of = {int(r["child"]): int(r["parent"]) for r in ct if r["child_size"] > 1}

    def selected_ancestor(c):
        while True:
            if c in selected:
                return c
            if c not in parent_of:
                return None
            c = parent_of[c]

    for r in point_rows:
        p = int(r["child"])
        c = int(r["parent"])
        target = selected_ancestor(c)
        if target is None:
            continue
        if target == root and not allow_single_cluster:
            continue
        # hdbscan's allow_single_cluster rule: when the root is the selected
        # cluster, points that fell out of the root directly at low lambda are
        # noise unless they outlive the root's split structure; we keep the
        # simpler rule (all points below root belong) which matches leaf-mode
        # usage on well-separated data.
        labels[p] = cluster_ids[target]
        lam_max = max_lambda.get(target, 0.0)
        lam_p = r["lambda_val"]
        if lam_max <= 0 or not np.isfinite(lam_p):
            probs[p] = 1.0
        else:
            probs[p] = min(lam_p, lam_max) / lam_max
    return labels, probs


def hdbscan_labels(
    dist=None,
    X=None,
    min_samples=5,
    min_cluster_size=5,
    cluster_selection_method="leaf",
    allow_single_cluster=False,
):
    """Full pipeline from a precomputed distance matrix (or raw euclidean vectors).

    Returns ``(labels, probabilities)`` with -1 for noise.
    """
    if dist is None:
        X = np.asarray(X, dtype=np.float64)
        diff = X[:, None, :] - X[None, :, :]
        dist = np.sqrt((diff * diff).sum(-1))
    dist = np.asarray(dist, dtype=np.float64)
    n = dist.shape[0]
    if n <= max(2, min_cluster_size):
        return np.zeros(n, dtype=np.intp), np.ones(n)

    mreach = mutual_reachability(dist, min_samples)
    mst = mst_linkage(mreach)
    slt = single_linkage_tree(mst)
    ct = condense_tree(slt, min_cluster_size)
    stability = compute_stability(ct)
    selected = select_clusters(
        ct, stability, method=cluster_selection_method,
        allow_single_cluster=allow_single_cluster,
    )
    if not selected:
        return np.full(n, -1, dtype=np.intp), np.zeros(n)
    return labels_and_probabilities(ct, selected, n, allow_single_cluster)


class HDBSCAN:
    """Minimal sklearn-style facade over :func:`hdbscan_labels` (the subset of the
    hdbscan API the reference uses: enstop_.py:339-345, 388-394)."""

    def __init__(
        self,
        min_samples=5,
        min_cluster_size=5,
        metric="euclidean",
        cluster_selection_method="eom",
        allow_single_cluster=False,
    ):
        self.min_samples = min_samples
        self.min_cluster_size = min_cluster_size
        self.metric = metric
        self.cluster_selection_method = cluster_selection_method
        self.allow_single_cluster = allow_single_cluster

    def fit(self, X):
        if self.metric == "precomputed":
            dist, vecs = np.asarray(X), None
        else:
            dist, vecs = None, X
        self.labels_, self.probabilities_ = hdbscan_labels(
            dist=dist,
            X=vecs,
            min_samples=self.min_samples,
            min_cluster_size=self.min_cluster_size,
            cluster_selection_method=self.cluster_selection_method,
            allow_single_cluster=self.allow_single_cluster,
        )
        return self

    def fit_predict(self, X):
        return self.fit(X).labels_
