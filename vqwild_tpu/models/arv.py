"""The three ARV retrieval models: baseline / va / vasa.

One Flax module covers all three methods (reference models/resnet18_3d_f2f.py,
resnet18_va.py, resnet18_vasa.py — selected by --method, main.py:194-217):

* baseline: trunk + classifier fc.
* va: + non-trainable visual_memory [nclass, 512] with sequential EMA updates,
  register logits −‖e−mem‖/τ, and a non-local block attending the support
  batch over the (freshly updated) memory feeding nled_fc.
* vasa: va + frozen semantic word-embedding memory and a SemanticAdaptor MLP
  producing word logits −‖sem − normalize(adaptor(e))‖/τ.

Output contract (train): frame_embed [B,T,512], clip_embed [B,512], logits,
and per-method nled_logits / reg_logits / word_logits. Eval: embeddings only
(the reference returns rank_embed alone in eval, resnet18_3d_f2f.py:154-157).

Known upstream divergences (documented):
* upstream constructs a second non-local block ``rank_nl`` that is never
  called (resnet18_va.py:114-119) — not created here; the torch importer
  skips its weights.
* upstream computes plain fc logits in va/vasa but discards them
  (resnet18_va.py:194-196); we return them as ``logits`` (they feed no loss
  for va/vasa, matching upstream's losses).

The visual memory lives in the ``memory`` variable collection — training-step
state, not a gradient parameter; under pjit it is replicated and the update is
computed from the global batch, making replicas consistent by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from vqwild_tpu.models import heads
from vqwild_tpu.models.resnet_f2f import ResNet18F2F

METHODS = ("baseline", "va", "vasa")


@dataclasses.dataclass
class ModelOutput:
    frame_embed: jnp.ndarray  # [B, T, 512] (= rank_embed transposed)
    clip_embed: jnp.ndarray  # [B, 512]
    logits: Optional[jnp.ndarray] = None  # [B, nclass] classifier
    nled_logits: Optional[jnp.ndarray] = None  # [B, nclass] (va/vasa)
    reg_logits: Optional[jnp.ndarray] = None  # [B, nclass] (va/vasa)
    word_logits: Optional[jnp.ndarray] = None  # [B, nclass] (vasa)

    @property
    def rank_embed(self):
        """Reference layout [B, C, T] (resnet18_3d_f2f.py:149-151)."""
        return jnp.transpose(self.frame_embed, (0, 2, 1))


jax.tree_util.register_pytree_node(
    ModelOutput,
    lambda o: (
        (o.frame_embed, o.clip_embed, o.logits, o.nled_logits, o.reg_logits, o.word_logits),
        None,
    ),
    lambda _, c: ModelOutput(*c),
)


class ARVModel(nn.Module):
    method: str = "baseline"
    nclass: int = 200
    feat_dim: int = 512
    dropout: float = 0.5
    # the non-local block's internal dropout (nl.py:103 hardcodes 0.2);
    # exposed so differential tests can run fully deterministically
    nl_dropout: float = 0.2
    temperature: float = 0.1
    moving_average: float = 0.9
    semantic_dim: int = 200
    bn_eps: float = 1e-3
    bn_momentum: float = 0.99
    stem_s2d: bool = False  # MXU-friendly stem lowering (resnet_f2f._Stem7x7S2D)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,
        targets=None,
        semantic_memory=None,
        train: bool = False,
        update_memory: bool = True,
        sample_weights=None,
    ) -> ModelOutput:
        """``sample_weights`` (0/1 per row, optional) marks padded rows whose
        EMA memory updates must be skipped (mesh row-padding; losses are
        weighted in train/step.py)."""
        assert self.method in METHODS, self.method
        frame_embed = ResNet18F2F(
            bn_eps=self.bn_eps,
            bn_momentum=self.bn_momentum,
            stem_s2d=self.stem_s2d,
            dtype=self.dtype,
            name="trunk",
        )(x, train=train)
        clip_embed = jnp.mean(frame_embed, axis=1)  # [B, 512]
        out = ModelOutput(frame_embed=frame_embed, clip_embed=clip_embed)
        if not train:
            return out

        dropped = nn.Dropout(self.dropout, deterministic=not train)(clip_embed)
        out.logits = heads.dense_torch(self.nclass, self.feat_dim, "fc", self.dtype)(
            dropped
        )
        if self.method == "baseline":
            return out

        assert targets is not None, "va/vasa training requires targets"
        visual_memory = self.variable(
            "memory",
            "visual_memory",
            lambda: jnp.zeros((self.nclass, self.feat_dim), jnp.float32),
        )
        norm_embed = heads.l2_normalize(clip_embed, axis=-1)
        # register logits against the PRE-update memory (resnet18_va.py:172-184)
        out.reg_logits = heads.memory_distance_logits(
            norm_embed, visual_memory.value, self.temperature
        )
        new_memory = heads.ema_memory_update(
            visual_memory.value, norm_embed, targets, self.moving_average,
            weights=sample_weights,
        )
        if update_memory and not self.is_initializing():
            visual_memory.value = new_memory
        # non-local attention uses the POST-update memory (resnet18_va.py:186-199)
        nled = heads.NonLocal1D(
            channels=self.feat_dim,
            inter_channels=self.feat_dim,
            dropout=self.nl_dropout,
            dtype=self.dtype,
            name="cls_nl",
        )(clip_embed, new_memory, train=train)
        out.nled_logits = heads.dense_torch(
            self.nclass, self.feat_dim, "nled_fc", self.dtype
        )(nled)

        if self.method == "vasa":
            assert semantic_memory is not None, "vasa requires semantic_memory"
            word_pred = heads.SemanticAdaptor(
                semantic_dim=self.semantic_dim, dtype=self.dtype, name="word_adaptor"
            )(clip_embed)
            out.word_logits = heads.memory_distance_logits(
                heads.l2_normalize(word_pred, axis=-1),
                semantic_memory,
                self.temperature,
            )
        return out


def build_model(cfg) -> ARVModel:
    """cfg: core.config.ModelConfig."""
    return ARVModel(
        method=cfg.method,
        nclass=cfg.nclass,
        feat_dim=cfg.feat_dim,
        dropout=cfg.dropout,
        temperature=cfg.temperature,
        moving_average=cfg.moving_average,
        semantic_dim=cfg.semantic_dim,
        bn_eps=cfg.bn_eps,
        bn_momentum=1.0 - cfg.bn_momentum,  # torch → flax convention
        stem_s2d=cfg.stem_s2d,
        dtype=jnp.dtype(cfg.compute_dtype),
    )


def init_model(model: ARVModel, rng, input_shape, semantic_dim: Optional[int] = None):
    """Initialize params + state with a tiny dummy batch.

    Returns (params, state) where state holds batch_stats (+ memory for
    va/vasa).
    """
    dummy = jnp.zeros(input_shape, jnp.float32)
    targets = jnp.zeros((input_shape[0],), jnp.int32)
    sem = (
        jnp.zeros((model.nclass, semantic_dim or model.semantic_dim), jnp.float32)
        if model.method == "vasa"
        else None
    )
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng},
        dummy,
        targets=targets,
        semantic_memory=sem,
        train=True,
    )
    variables = dict(variables)
    params = variables.pop("params")
    state = FrozenDict(variables)
    return params, state
