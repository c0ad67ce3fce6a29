"""kgcn_tpu — a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of clinfo/kGCN
(reference: /root/reference): molecular property prediction, compound-protein
interaction, knowledge-graph link prediction and graph generation — built
TPU-first:

* graphs are batched into flat, statically-shaped ``GraphBatch`` pytrees
  (segment ids + padded COO edge lists) instead of per-graph feed_dict
  SparseTensors (reference: kgcn/feed.py:112-126),
* aggregation runs through one fused batched kernel (dense MXU path for
  small padded molecules, Pallas/segment-sum sparse path for block-diagonal
  mega-batches) instead of per-graph per-channel Python loops
  (reference: kgcn/layers.py:107-115),
* scaling is expressed with `jax.sharding` meshes + collectives rather than
  shell-level multi-process parallelism (reference: gcn.py:749-753).
"""

__version__ = "0.1.0"

from kgcn_tpu.graph.batch import GraphBatch  # noqa: F401
