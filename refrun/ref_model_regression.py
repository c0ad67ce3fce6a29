"""Reference-side GCN regression model for the solubility parity protocol.

The reference ships no regression example model, so this defines one USING
THE REFERENCE'S OWN layer library (kgcn.layers GraphConv/GraphDense/
GraphGather over its DefaultModel placeholder protocol) with a linear head
and masked MSE — the exact architecture our `gcn_regression` registry model
implements TPU-natively (kgcn_tpu/models/standard.py).  Loaded by
refrun/run_reference_cv.py as ``ref_model_regression:GCNRegression``.
"""
import tensorflow as _tf

if _tf.__version__.split(".")[0] == "2":
    import tensorflow.compat.v1 as tf
else:  # pragma: no cover
    tf = _tf

import kgcn.layers
from kgcn.default_model import DefaultModel


def _dense(x, units, name):
    """Graph-mode Dense (Keras-3 layers reject TF1 graph tensors)."""
    dim = int(x.shape[-1])
    with tf.variable_scope(name, reuse=tf.AUTO_REUSE):
        w = tf.get_variable("kernel", [dim, units],
                            initializer=tf.glorot_uniform_initializer())
        b = tf.get_variable("bias", [units],
                            initializer=tf.zeros_initializer())
    return tf.matmul(x, w) + b


class GCNRegression(DefaultModel):
    def build_placeholders(self, info, config, batch_size, **kwargs):
        keys = [
            "adjs", "nodes", "labels", "mask", "dropout_rate",
            "enabled_node_nums", "is_train", "features",
        ]
        return self.get_placeholders(info, config, batch_size, keys, **kwargs)

    def build_model(self, placeholders, info, config, batch_size, **kwargs):
        adj_channel_num = info.adj_channel_num
        in_adjs = placeholders["adjs"]
        features = placeholders["features"]
        labels = placeholders["labels"]
        mask = placeholders["mask"]
        enabled_node_nums = placeholders["enabled_node_nums"]

        layer = features
        layer = kgcn.layers.GraphConv(50, adj_channel_num)(layer, adj=in_adjs)
        layer = tf.sigmoid(layer)
        layer = kgcn.layers.GraphConv(50, adj_channel_num)(layer, adj=in_adjs)
        layer = tf.sigmoid(layer)
        layer = kgcn.layers.GraphDense(50)(layer)
        layer = tf.sigmoid(layer)
        layer = kgcn.layers.GraphGather()(layer)
        layer = _dense(layer, 1, "readout")
        prediction = layer

        diff = prediction - tf.cast(labels, tf.float32)
        per_graph = mask * tf.reduce_sum(diff * diff, axis=1)
        cost_opt = tf.reduce_mean(per_graph)
        cost_sum = tf.reduce_sum(per_graph)
        metrics = {
            "error_sum": cost_sum,
            "count": tf.reduce_sum(mask),
        }
        self.out = layer
        return self, prediction, cost_opt, cost_sum, metrics
