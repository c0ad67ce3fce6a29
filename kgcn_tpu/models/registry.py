"""Model registry + reference-config compatibility.

The reference loads models by dotted path from the ``model.py`` config key
(gcn.py:135-151).  We keep a first-class registry (name → builder) and map the
reference's shipped model paths onto our equivalents so existing kGCN config
files run unchanged; a dynamic-import escape hatch supports user model files
defining ``build(info, config) -> flax.linen.Module``.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable] = {}

# reference "model.py" values → registry names
_REFERENCE_ALIASES = {
    "example_model.model:GCN": "gcn",
    "example_model.model_gin:GIN": "gin",
    "example_model.model_gat:GAT": "gat",
    "example_model.model_multitask:GCN": "gcn_multitask",
    "example_model.model_node_label:GCN": "gcn_node_label",
    "example_model.model_multimodal:GCN": "gcn_multimodal",
    "example_model.model_vae:VAE": "gcn_vae",
    "example_model.model_vae_onlylink:VAE": "gcn_vae_onlylink",
    "example_model.model_multimodal_vec:GCN": "gcn_vector_modal",
    "example_model.model_multimodal_regression:GCN": "gcn_multimodal",
    "sample_kg.network_prediction.model_py.distmult:DistMult": "kg_distmult",
    "example_model.model_rxn_3layer:GCN": "gcn_rxn_3layer",
    "model": "gcn",
}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def available() -> list:
    return sorted(_REGISTRY)


def build_model(name: str, info, config: Dict[str, Any]):
    """Resolve a model name (registry key, reference alias, or
    ``module:attr`` dynamic path) and build the flax module."""
    key = _REFERENCE_ALIASES.get(name, name)
    if key in _REGISTRY:
        return _REGISTRY[key](info, config)
    if ":" in name:  # user escape hatch: module must define build(info, config)
        mod_name, attr = name.split(":", 1)
        mod = importlib.import_module(mod_name)
        target = getattr(mod, attr)
        if hasattr(target, "build"):
            return target.build(info, config)
        return target(info, config)
    raise KeyError(f"unknown model '{name}'; available: {available()}")


def _common(info, config):
    return dict(
        channels=info.adj_channel_num,
        label_dim=info.label_dim or 2,
    )


@register("gcn")
def _gcn(info, config):
    from kgcn_tpu.models.standard import GCN

    return GCN(
        **_common(info, config),
        dropout_rate=float(config.get("dropout_rate", 0.2)),
        all_node_num=info.all_node_num,
        embedding_dim=int(config.get("embedding_dim", 10)),
    )


@register("gin")
def _gin(info, config):
    from kgcn_tpu.models.standard import GIN

    return GIN(**_common(info, config))


@register("gcn_rxn_3layer")
def _gcn_rxn_3layer(info, config):
    from kgcn_tpu.models.standard import RxnGCN

    return RxnGCN(
        **_common(info, config),
        all_node_num=info.all_node_num,
        embedding_dim=int(config.get("embedding_dim", 10)),
    )


@register("gat")
def _gat(info, config):
    from kgcn_tpu.models.standard import GATModel

    return GATModel(
        gat_normalize=str(config.get("gat_normalize", "sender")),
        **_common(info, config),
    )


@register("gcn_multitask")
def _gcn_multitask(info, config):
    from kgcn_tpu.models.standard import GCNMultitask

    pw = None
    if info.pos_weight is not None:
        pw = tuple(float(x) for x in info.pos_weight)
    return GCNMultitask(
        **_common(info, config),
        pos_weight=pw,
        dropout_rate=float(config.get("dropout_rate", 0.2)),
        all_node_num=info.all_node_num,
        embedding_dim=int(config.get("embedding_dim", 10)),
    )


@register("gcn_multimodal")
def _gcn_multimodal(info, config):
    from kgcn_tpu.models.multimodal import GCNMultimodal

    task = "regression" if "regression" in config.get("task", "") else "classification"
    return GCNMultimodal(
        **_common(info, config),
        sequence_symbol_num=max(info.sequence_symbol_num, 1),
        embedding_dim=int(config.get("embedding_dim", 10)),
        task=task,
    )


@register("gcn_vector_modal")
def _gcn_vector_modal(info, config):
    from kgcn_tpu.models.multimodal import GCNVectorModal

    task = "regression" if "regression" in config.get("task", "") else "classification"
    return GCNVectorModal(
        **_common(info, config),
        num_modals=max(len(info.vector_modal_dim), 1),
        task=task,
    )


@register("gcn_regression")
def _gcn_regression(info, config):
    from kgcn_tpu.models.multimodal import GCNRegression

    return GCNRegression(
        channels=info.adj_channel_num,
        label_dim=info.label_dim or 1,
        dropout_rate=float(config.get("dropout_rate", 0.2)),
    )


@register("gcn_vae")
def _gcn_vae(info, config):
    from kgcn_tpu.models.vae import GCNVAE

    return GCNVAE(
        channels=info.adj_channel_num,
        feature_dim=info.feature_dim,
        latent_dim=int(config.get("latent_dim", 64)),
    )


@register("gcn_vae_onlylink")
def _gcn_vae_onlylink(info, config):
    """Link-only VAE (model_vae_onlylink.py); the gen engine computes
    pos_weight/norm from edge density, config overrides work too."""
    from kgcn_tpu.models.vae import GCNVAE

    return GCNVAE(
        channels=info.adj_channel_num,
        feature_dim=info.feature_dim,
        latent_dim=int(config.get("latent_dim", 64)),
        link_only=True,
        pos_weight=float(config.get("pos_weight", 1.0)),
        norm=float(config.get("norm", 1.0)),
    )


@register("kg_distmult")
def _kg_distmult(info, config):
    from kgcn_tpu.models.kg import KGLinkPredictor

    return KGLinkPredictor(
        all_node_num=info.all_node_num,
        embedding_dim=int(config.get("embedding_dim", 10)),
        channels=info.adj_channel_num,
        encoder=config.get("kg_encoder", "embedding"),
    )


@register("seq_cnn")
def _seq_cnn(info, config):
    from kgcn_tpu.models.multimodal import SequenceCNN

    return SequenceCNN(
        vocab_size=max(info.sequence_symbol_num, 2),
        label_dim=info.label_dim or 2,
        embedding_dim=int(config.get("embedding_dim", 10)),
    )


@register("gcn_node_label")
def _gcn_node_label(info, config):
    from kgcn_tpu.models.standard import GCNNodeLabel

    return GCNNodeLabel(
        **_common(info, config),
        all_node_num=info.all_node_num,
        embedding_dim=int(config.get("embedding_dim", 10)),
    )
