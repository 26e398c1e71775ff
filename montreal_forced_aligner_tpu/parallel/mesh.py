"""Device mesh helpers.

The reference's only parallelism is single-host multiprocessing over
speaker-sharded jobs (``corpus/base.py:922-1035``, ``utils.py:1355-1432``).
The TPU-native equivalent is data parallelism over utterance batches on a
1-D ``jax.sharding.Mesh`` ("data" axis spans all chips across hosts — ICI
within a slice, DCN across slices, both handled by XLA collectives).
Speaker grouping is preserved at batch-construction time so per-speaker
statistics stay shard-local where possible; global per-speaker reductions
(CMVN, fMLLR) ride ``psum``/``all_gather``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def get_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def shard_leading_axis(mesh: Mesh, tree, axis_name: str = "data"):
    """Place every array in ``tree`` with its leading axis sharded over the
    mesh (the utterance-batch axis)."""
    sharding = NamedSharding(mesh, PartitionSpec(axis_name))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicated(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, PartitionSpec())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
