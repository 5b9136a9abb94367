"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the JAX host
platform to expose 8 virtual CPU devices (the TPU analog of "test multi-node
without a cluster" — see SURVEY.md §4d).  Must run before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# the graft-entry dryrun probes the device backend in a subprocess (the
# tunneled TPU relay can be dead and hang forever); tests always want the
# CPU path, so don't wait out the full probe timeout
os.environ.setdefault("ENSTOP_DEVICE_PROBE_TIMEOUT", "5")
prev = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize imports jax at interpreter startup (registering the
# TPU plugin and capturing JAX_PLATFORMS from the env), so the env vars above may be
# too late — override through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def make_corpus(rng, n_docs=60, n_words=90, avg_doc_len=40, n_topics_true=5, seed=None):
    """Small synthetic bag-of-words corpus with genuine topic structure."""
    if seed is not None:
        rng = np.random.RandomState(seed)
    topics = rng.dirichlet(np.full(n_words, 0.1), size=n_topics_true)
    doc_topic = rng.dirichlet(np.full(n_topics_true, 0.3), size=n_docs)
    word_probs = doc_topic @ topics
    lengths = rng.poisson(avg_doc_len, size=n_docs) + 5
    X = np.stack(
        [rng.multinomial(lengths[i], word_probs[i]) for i in range(n_docs)]
    ).astype(np.float32)
    return X


@pytest.fixture
def small_corpus(rng):
    return make_corpus(rng)
