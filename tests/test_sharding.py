"""Multi-chip self-consistency: N-shard result == single-chip result.

Runs on the 8-device virtual CPU mesh from conftest (the reference has
no distributed analogue, SURVEY.md §4).
"""

import numpy as np
import jax
import pytest

from tests.conftest import random_fasta
from genometester4_tpu.io.fasta import parse_sequences
from genometester4_tpu.parallel.sharding import make_mesh, count_kmers_sharded
from genometester4_tpu.pipelines.listmaker import count_chunks, merge_sorted_shards


def _single_chip(codes, k):
    shards = list(count_chunks(codes, k, chunk_bases=1 << 15))
    ws, cs = [], []
    for w, c in merge_sorted_shards(shards):
        ws.append(w)
        cs.append(c)
    return (np.concatenate(ws) if ws else np.empty(0, np.uint64),
            np.concatenate(cs) if cs else np.empty(0, np.uint32))


@pytest.mark.parametrize("k,dp", [(16, 2), (25, 1), (8, 4)])
def test_sharded_equals_single(rng, k, dp):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    text = random_fasta(rng, 6, 2000, 5000, n_prob=0.01)
    codes = parse_sequences(text.encode()).codes
    mesh = make_mesh(8, dp=dp)
    w_sh, c_sh = count_kmers_sharded(codes, k, mesh, chunk_bases=1 << 13)
    w_1, c_1 = _single_chip(codes, k)
    np.testing.assert_array_equal(w_sh, w_1)
    np.testing.assert_array_equal(c_sh, c_1)


def test_sharded_output_globally_sorted(rng):
    text = random_fasta(rng, 3, 3000, 6000)
    codes = parse_sequences(text.encode()).codes
    mesh = make_mesh(8, dp=2)
    w, _ = count_kmers_sharded(codes, 16, mesh, chunk_bases=1 << 13)
    assert np.all(w[1:] > w[:-1])
