"""Drop-in import path (reference module: enstop/enstop_.py)."""

from .models.ensemble import (
    EnsembleTopics,
    ensemble_fit,
    ensemble_of_topics,
    generate_combined_topics_hellinger,
    generate_combined_topics_hellinger_umap,
    generate_combined_topics_kl,
    nmf_topics,
    plsa_topics,
)
from .cluster.distances import (
    all_pairs_hellinger_distance,
    all_pairs_kl_divergence,
    hellinger,
    kl_divergence,
)

__all__ = [
    "EnsembleTopics",
    "ensemble_fit",
    "ensemble_of_topics",
    "plsa_topics",
    "nmf_topics",
    "generate_combined_topics_kl",
    "generate_combined_topics_hellinger",
    "generate_combined_topics_hellinger_umap",
    "all_pairs_kl_divergence",
    "all_pairs_hellinger_distance",
    "hellinger",
    "kl_divergence",
]
