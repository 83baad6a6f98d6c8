"""The full VoxelNet detector as one flax module + jit-ready functions.

Role of the reference's `RPN3D` (voxelnet/model.py:284-441) redesigned for
TPU: the module is pure (no host round-trips, no loss coupled into forward);
voxelization, target assignment, loss, decode and NMS are composed around it
as jittable functions so that

  * inference  = ONE jitted graph: points -> voxelize -> VFE -> dense ->
                 middle -> RPN -> decode -> NMS  (no labels required — the
                 reference needed a submodule side-door for that,
                 predict.py:58-60)
  * train step = ONE jitted graph: voxels -> forward -> on-device targets ->
                 loss -> grads (the reference ran targets on the host every
                 step, model.py:309).

Note: the RPN first-block stride defaults to 2 for every class. The
reference uses stride 1 for Pedestrian/Cyclist (model.py:221-227), which
makes its head output 2x the anchor grid and would break its own target
shapes — a latent bug we do not carry by default; `rpn.block1_stride: 1`
instantiates that exact topology for parity checks (SURVEY.md §2).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.ad_checkpoint
import jax.numpy as jnp
import numpy as np

from voxelnet_tpu.config import VoxelNetConfig
from voxelnet_tpu.models.middle import MiddleLayers
from voxelnet_tpu.parallel import execution_platform
from voxelnet_tpu.models.rpn import RPN
from voxelnet_tpu.models.scatter import (
    scatter_to_dense, scatter_to_dense_folded, scatter_to_dense_streamed)
from voxelnet_tpu.models.vfe import FeatureLearningNet
from voxelnet_tpu.ops import anchors as anchor_ops
from voxelnet_tpu.ops import box_coding, nms
from voxelnet_tpu.ops.voxelize import (
    VoxelGridSpec, Voxels, resolve_backend, voxelize_batch_jax)


class VoxelNet(nn.Module):
    """features (B, K, T, 7), coords (B, K, 3), counts (B, K) ->
    (cls_logits (B, H', W', 2), reg (B, H', W', 14)).

    `spatial_shard=True` pins the dense grid / BEV maps to a
    ('data', ..., 'model', channel) layout so the conv stages shard their W
    axis over the 'model' mesh axis — XLA inserts the halo exchanges. This
    is the spatial/context-parallel axis for this conv detector
    (SURVEY.md §5); requires an active ('data', 'model') mesh.
    """

    grid_dzyx: tuple[int, int, int]
    dtype: Any = jnp.bfloat16
    bn_over_padding: bool = False
    # rpn.block1_stride: 1 reproduces the reference's (buggy) non-Car
    # topology, voxelnet/model.py:221-227
    rpn_block1_stride: int = 2
    # 'conv3d' | 'folded2d' — mathematically identical middle-conv
    # lowerings sharing one parameter tree (models/middle.py)
    middle_backend: str = "conv3d"
    # XLA scatter hints for the dense-grid build — valid only for
    # voxelizer-ordered buffers (models/scatter.py docstring)
    scatter_hints: bool = False
    spatial_shard: bool = False
    # 'model' mesh-axis size — the sparse1 shard_map needs it statically
    # (the dense lowerings get it from the sharding constraints alone)
    num_model: int = 1
    # planar-T VFE: `features` is the RAW voxel-major (B, 4, T, K) table
    # from ops.voxelize.voxelize_planar_t; the VFE runs in that layout
    # (models/vfe_planar.py — identical math and parameter tree)
    planar_vfe: bool = False
    # depth->BEV fold absorbed into the RPN's first conv kernel
    # (rpn._BEVFoldConv): the middle stack hands RPN its raw 5D output
    # and the ~433 MB/batch8 fold transpose disappears
    # (data.bev_fold='dsplit'; identical math and parameter tree)
    bev_dsplit: bool = False
    # partition entry for the batch axis in sharding constraints: 'data'
    # on a ('data', 'model') mesh, ('dcn', 'data') on the multi-host
    # ('dcn', 'data', 'model') mesh
    batch_axes: Any = "data"
    # eval-time BN folding (models/bn_fold.py): apply ONLY with
    # fold_bn_variables-transformed params; every middle/RPN BN op is
    # skipped (the affine lives in the conv kernels). Eval graphs only.
    fold_bn: bool = False
    # sparse->dense grid lowering: 'scatter' (XLA) | 'pallas' (streaming
    # block-fill, kernels/dense_build.py; resolve_dense_build gates the
    # shape/sharding constraints). dense_interpret runs the kernel in
    # the Pallas interpreter off-TPU.
    dense_backend: str = "scatter"
    dense_interpret: bool = False

    @nn.compact
    def __call__(self, features, coords, counts, train: bool = False):
        if self.planar_vfe:
            from voxelnet_tpu.models.vfe_planar import (
                PlanarFeatureLearningNet)

            voxelwise = PlanarFeatureLearningNet(
                dtype=self.dtype, bn_over_padding=self.bn_over_padding,
                name="feature_net")(features, counts, train)
        else:
            voxelwise = FeatureLearningNet(
                dtype=self.dtype, bn_over_padding=self.bn_over_padding,
                name="feature_net")(features, counts, train)
        # remat seam (train.remat='seams'): the small (B, K, 128) table is
        # a saved residual; the dense grid below is recomputed in backward
        voxelwise = jax.ad_checkpoint.checkpoint_name(voxelwise, "voxelwise")
        folded = self.middle_backend == "folded2d"
        if self.middle_backend in ("sparse1", "sparsebwd"):
            # block 1 consumes the voxel table directly — the C=128 dense
            # grid (and its scatter) never exists in this graph. Under
            # spatial sharding, block-1's shard_map computes each 'model'
            # shard's W slab from the replicated table (halo-free,
            # sparse_conv3x3_sharded); blocks 2-3 then run as the usual
            # W-sharded convs with XLA halo exchanges.
            dense = (voxelwise, coords, counts)
        elif folded:
            dense = scatter_to_dense_folded(
                voxelwise, coords, counts, self.grid_dzyx)
        elif self.dense_backend == "pallas" and coords.shape[1] % 8 == 0:
            # K % 8 is a kernel constraint; init_params traces with K=1
            # dummies — those (and any odd bucket) take the scatter
            dense = scatter_to_dense_streamed(
                voxelwise, coords, counts, self.grid_dzyx,
                interpret=self.dense_interpret)
        else:
            dense = scatter_to_dense(
                voxelwise, coords, counts, self.grid_dzyx,
                indices_sorted=self.scatter_hints)
        if self.spatial_shard:
            from jax.sharding import PartitionSpec as P

            if self.middle_backend in ("sparse1", "sparsebwd"):
                # the voxel table: batch-sharded, model-replicated
                dense = jax.lax.with_sharding_constraint(
                    dense, (P(self.batch_axes, None, None),
                            P(self.batch_axes, None, None),
                            P(self.batch_axes, None)))
            else:
                spec = (P(self.batch_axes, None, "model", None) if folded
                        else P(self.batch_axes, None, None, "model", None))
                dense = jax.lax.with_sharding_constraint(dense, spec)
        bev = MiddleLayers(dtype=self.dtype, backend=self.middle_backend,
                           depth_in=self.grid_dzyx[0],
                           grid_hw=self.grid_dzyx[1:],
                           num_model=self.num_model if self.spatial_shard
                           else 1,
                           scatter_hints=self.scatter_hints,
                           fold=not self.bev_dsplit,
                           fold_bn=self.fold_bn,
                           name="middle")(dense, train)
        # second remat seam: RPN backward recomputes from here, middle
        # backward recomputes scatter+convs from the voxelwise seam
        bev = jax.ad_checkpoint.checkpoint_name(bev, "bev")
        if self.spatial_shard:
            from jax.sharding import PartitionSpec as P

            spec = (P(self.batch_axes, None, None, "model", None)
                    if self.bev_dsplit
                    else P(self.batch_axes, None, "model", None))
            bev = jax.lax.with_sharding_constraint(bev, spec)
        return RPN(block1_stride=self.rpn_block1_stride, dtype=self.dtype,
                   fold_bn=self.fold_bn, name="rpn")(bev, train)


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (B, post_topk, 7) lidar boxes
    scores: jnp.ndarray   # (B, post_topk)
    valid: jnp.ndarray    # (B, post_topk) bool


def resolve_middle_backend(config: VoxelNetConfig,
                           platform: str | None = None) -> str:
    """Resolve data.middle_backend. 'auto' picks the measured winner
    (BASELINE.md MFU ladder): 'wpack2' on TPU — every middle conv emits
    64 channels, half-filling the 128-lane MXU, so the stack runs in a
    W-PAIRED layout throughout: block 1 computes two adjacent W
    positions per output row (zero-padded (3,3,4,Cin,128) kernel at
    W-stride 2, models/middle._WPackConv), BatchNorm/ReLU stay in the
    paired (.., W/2, 128) layout (_PairedBatchNorm pools the
    half-lanes), and blocks 2-3 consume the paired tensor directly
    (_PPackConv) — the unpair/repair layout copies the per-block
    'wpack' variant paid (~19 ms/B8, profiles/trace_r3b.md) never
    happen. Measured (v5e): inference 101.4 (conv3d) -> 110.1 (wpack)
    -> 120.9 f/s @B24 (wpack2); train 33.8 -> 35.6 -> 37.2 @B8.
    Off-TPU, or when the grid W is odd (the pairing needs an even W),
    'auto' stays 'conv3d'. Among the rest: 'conv3d' — on v5e the other
    dense lowerings lose (folded2d pays its Din/3 FLOP multiplier:
    train 23.5 vs 28.9 f/s @B8, and its (B,H,W,D*C) activations OOM at
    the B24 inference sweet spot; tap2d rows recorded in the ladder).
    'sparse1'
    (block 1 off the voxel table, models/sparse_conv.py; under spatial
    sharding each 'model' shard computes its W slab halo-free via
    shard_map) measured 10.8 f/s on the middle stage vs conv3d's 87.1
    (v5e, B8): its 27 per-offset scatter-adds hit XLA's TPU scatter
    throughput (~10M rows/s — each (oz,oy,ox) row is a read-modify-write
    dependency XLA serializes), drowning the MXU-filling matmul win, so
    'auto' never selects it. The explicit knobs stay for exactness tests
    and other grids/hardware.

    'sparsebwd' keeps the conv3d FORWARD (scatter + dense Conv3D, bit
    identical) and swaps block-1's BACKWARD for the slice-gather +
    matmul VJP (models/sparse_conv.conv3x3_sparsebwd) — inference is
    untouched, training skips the dense grad-input transposed conv and
    grad-weight correlation. Measured on v5e it LOSES: per-voxel
    dynamic_slice gathers serialize (scripts/probe_gather.py — 882 ms
    for the window form, 55 ms for plain row gathers vs the 54 ms
    dense pair), and the (B,K,27*64) gathered cotangent OOMs the B8
    train step (18.7 GB HBM; 18.6 f/s at B4 vs conv3d's 29.7 at B8,
    BASELINE.md). 'auto' never selects it. Not available under spatial
    'model' sharding (the custom VJP has no halo-free shard_map form;
    the dense path's XLA halo exchanges handle that case)."""
    configured = config.data.middle_backend
    if configured not in ("auto", "conv3d", "folded2d", "tap2d",
                          "sparse1", "sparsebwd", "wpack", "wpack2"):
        raise ValueError(
            f"data.middle_backend={configured!r} — expected one of "
            "'auto', 'conv3d', 'folded2d', 'tap2d', 'sparse1', "
            "'sparsebwd', 'wpack', 'wpack2' (a typo would silently run the "
            "conv3d path)")
    if configured == "sparsebwd" and config.system.num_model_shards > 1:
        raise ValueError(
            "data.middle_backend='sparsebwd' does not partition over "
            "the spatial 'model' axis — use 'conv3d' (or 'auto') when "
            "num_model_shards > 1")
    if configured != "auto":
        return configured
    if (execution_platform(platform=platform) == "tpu"
            and config.object.grid_size[2] % 2 == 0):
        return "wpack2"
    return "conv3d"


def resolve_train_vfe_backend(config: VoxelNetConfig,
                              platform: str | None = None) -> str:
    """Resolve data.train_vfe_backend for the explicit-table graphs
    (train / eval steps).

    'planar' feeds the model the RAW voxel-major (B, 4, T, K) table from
    the Pallas run-copy (ops.voxelize.voxelize_planar_t — 7.6 vs the XLA
    row scatter's 29.7 ms/batch8 on v5e) and runs the VFE in that layout
    (models/vfe_planar.py; identical math and parameter tree, both BN
    modes). Measured on the chip it wins the train step 32.3 vs 29.7
    f/s @B8 (BASELINE.md ladder), so 'auto' selects it on TPU whenever
    it applies: kernel shape constraints (T < 128, max_voxels a
    multiple of 128 or <= 128) and device voxelization (not
    train.host_voxelize, which feeds pre-built (B, K, T, 7) buffers).
    Mesh sharding is fine — the table build runs under shard_map over
    the batch axes (voxelize_planar_t_sharded; exercised by
    dryrun_multichip). Off-TPU 'auto' stays 'xla' (the interpreted
    kernel is test-only).
    """
    configured = config.data.train_vfe_backend
    if configured not in ("auto", "xla", "planar"):
        raise ValueError(
            f"data.train_vfe_backend={configured!r} — expected 'auto', "
            "'xla' or 'planar'")
    K, T = config.data.max_voxels, config.object.points_per_voxel
    fits = T < 128 and (K <= 128 or K % 128 == 0)
    if configured == "planar":
        if config.train.host_voxelize:
            raise ValueError(
                "data.train_vfe_backend='planar' voxelizes on device — "
                "incompatible with train.host_voxelize (pipeline feeds "
                "pre-built (B, K, T, 7) buffers)")
        if not fits:
            raise ValueError(
                "data.train_vfe_backend='planar' needs points_per_voxel "
                f"< 128 and max_voxels % 128 == 0 (got T={T}, K={K})")
        return configured
    if configured != "auto":
        return configured
    if (fits and not config.train.host_voxelize
            and execution_platform(platform=platform) == "tpu"):
        return "planar"
    return "xla"


def resolve_bev_fold(config: VoxelNetConfig,
                     platform: str | None = None) -> str:
    """Resolve data.bev_fold for the depth->BEV junction.

    'dsplit' hands the RPN the middle stack's raw (B, D', H, W, C)
    output and absorbs the reference's c-major fold (voxelnet/
    model.py:262) into the first RPN conv's kernel (rpn._BEVFoldConv) —
    the fold transpose never materializes. 'transpose' is the explicit
    fold (models/middle.py). Identical math and parameter tree either
    way; 'auto' picks the measured winner per platform (BASELINE.md).
    folded2d activations are already depth-folded, so it keeps
    'transpose' semantics regardless.
    """
    configured = config.data.bev_fold
    if configured not in ("auto", "transpose", "dsplit"):
        raise ValueError(
            f"data.bev_fold={configured!r} — expected 'auto', "
            "'transpose' or 'dsplit'")
    middle = resolve_middle_backend(config, platform)
    if configured == "dsplit":
        if middle == "folded2d":
            raise ValueError(
                "data.bev_fold='dsplit' needs a 5D-output middle backend "
                "(folded2d activations are already depth-folded)")
        return configured
    if configured != "auto":
        return configured
    if (middle != "folded2d"
            and execution_platform(platform=platform) == "tpu"):
        return "dsplit"
    return "transpose"


def build_model(config: VoxelNetConfig,
                platform: str | None = None,
                fold_bn: bool = False) -> VoxelNet:
    """`platform`: execution platform for the 'auto' backend resolves —
    defaults to the ambient mesh / default backend (execution_platform).
    `fold_bn`: build the eval-only BN-folded graph (apply with
    models.bn_fold.fold_bn_variables-transformed params)."""
    num_dcn = getattr(config.system, "num_dcn_shards", 1)
    platform = execution_platform(platform=platform)
    return VoxelNet(
        fold_bn=fold_bn,
        dense_backend=resolve_dense_build(config, platform),
        dense_interpret=platform != "tpu",
        grid_dzyx=config.object.grid_size,
        dtype=jnp.dtype(config.train.compute_dtype),
        bn_over_padding=config.compat.bn_over_padding,
        rpn_block1_stride=config.rpn.block1_stride,
        middle_backend=resolve_middle_backend(config, platform),
        scatter_hints=config.data.scatter_hints,
        spatial_shard=config.system.num_model_shards > 1,
        num_model=config.system.num_model_shards,
        batch_axes=("dcn", "data") if num_dcn > 1 else "data",
        planar_vfe=resolve_train_vfe_backend(config, platform) == "planar",
        bev_dsplit=resolve_bev_fold(config, platform) == "dsplit",
    )


def init_params(config: VoxelNetConfig, rng: jax.Array,
                platform: str | None = None):
    """Initialize params/batch_stats with tiny dummy buffers (shapes only
    matter along T and channel axes, so K=1 keeps init cheap). Runs under
    jit — eager per-op dispatch of the init graph is ~15x slower.

    The planar-T model initializes an IDENTICAL tree (asserted in
    tests/test_vfe_planar.py), so checkpoints are interchangeable."""
    platform = execution_platform(platform=platform)
    model = build_model(config, platform)
    T = config.object.points_per_voxel
    planar = resolve_train_vfe_backend(config, platform) == "planar"

    @jax.jit
    def _init(r):
        feats = (jnp.zeros((1, 4, T, 1), jnp.float32) if planar
                 else jnp.zeros((1, 1, T, 7), jnp.float32))
        coords = jnp.zeros((1, 1, 3), jnp.int32)
        counts = jnp.zeros((1, 1), jnp.int32)
        return model.init(r, feats, coords, counts, train=False)

    return _init(rng)


def resolve_vfe_backend(config: VoxelNetConfig,
                        platform: str | None = None) -> str:
    """Resolve data.vfe_backend for the inference graph.

    'auto' selects the fused Pallas voxelize+VFE kernel
    (kernels/vfe_fused.py — measured 2.5x the XLA stage on v5e, 243 ->
    600 frames/sec at batch 8) when it applies: TPU backend (the kernel
    needs Mosaic; CPU tests run interpret-mode separately), kernel shape
    constraints (T < 128, max_voxels % 128 == 0), and no 'model'
    sharding. Batch ('data'/'dcn') sharding is fine — the kernel runs
    under shard_map per batch shard (voxelize_vfe_fused_sharded);
    spatial 'model' sharding keeps the XLA path (the pallas_call would
    compute replicated work on every model shard for no win).
    """
    configured = config.data.vfe_backend
    sys = config.system
    model_sharded = sys.num_model_shards > 1
    if configured == "fused":
        # an explicit request must not silently change semantics: the
        # kernel implements the corrected masked-max VFE only
        if config.compat.bn_over_padding:
            raise ValueError(
                "data.vfe_backend='fused' is incompatible with "
                "compat.bn_over_padding (reference ghost-activation "
                "semantics) — use the 'xla' backend")
        if model_sharded:
            raise ValueError(
                "data.vfe_backend='fused' does not partition over the "
                "spatial 'model' axis — use 'xla' (or 'auto') when "
                "num_model_shards > 1")
        return configured
    if configured != "auto":
        return configured
    if config.compat.bn_over_padding:
        # the fused kernel implements the corrected masked-max semantics;
        # reference ghost-activation parity mode must take the XLA path
        return "xla"
    fits = (config.object.points_per_voxel < 128
            and config.data.max_voxels % 128 == 0)
    if (not model_sharded and fits
            and execution_platform(platform=platform) == "tpu"):
        return "fused"
    return "xla"


def resolve_dense_build(config: VoxelNetConfig,
                        platform: str | None = None) -> str:
    """Resolve data.dense_build for the sparse->dense grid lowering.

    'auto' -> 'scatter': the Pallas streaming block-fill
    (kernels/dense_build.py) measured EQUAL to the XLA scatter in the
    real graph (310.3 vs 311.1 f/s on the voxelize+VFE+dense stage,
    v5e B24; full graph 120.7 vs 121.0) — both sit at the same ~245
    GB/s effective-write wall — and the kernel adds shape/sharding
    constraints (a block size must divide D*H*W, max_voxels % 8 == 0,
    no mesh partitioning), so the scatter stays the default.
    Explicit 'pallas' raises on those constraints instead of silently
    degrading."""
    configured = getattr(config.data, "dense_build", "auto")
    if configured not in ("auto", "scatter", "pallas"):
        raise ValueError(
            f"data.dense_build={configured!r} — expected 'auto', "
            "'scatter' or 'pallas'")
    from voxelnet_tpu.kernels.dense_build import pick_block_rows

    sys_cfg = config.system
    sharded = (sys_cfg.num_data_shards * sys_cfg.num_model_shards
               * getattr(sys_cfg, "num_dcn_shards", 1)) > 1
    D, H, W = config.object.grid_size
    fits = (pick_block_rows(D * H * W) is not None
            and config.data.max_voxels % 8 == 0)
    if configured == "pallas":
        if sharded:
            raise ValueError(
                "data.dense_build='pallas' does not partition over a "
                "mesh — use 'scatter' (or 'auto') on sharded configs")
        if not fits:
            raise ValueError(
                f"data.dense_build='pallas' needs a block size dividing "
                f"D*H*W={D * H * W} and max_voxels % 8 == 0")
        return configured
    return "scatter"


def resolve_fold_bn(config: VoxelNetConfig) -> bool:
    """Resolve data.fold_bn for the inference graph ('auto' -> on).

    Eval-time BN is a per-channel affine; folding it into the adjacent
    conv kernels (models/bn_fold.py) is platform-independent graph
    algebra, so 'auto' enables it everywhere. 'off' keeps the reference
    graph shape (separate Conv+BN ops, voxelnet/model.py:111-167) for
    A/B numerics work."""
    configured = getattr(config.data, "fold_bn", "auto")
    if configured not in ("auto", "on", "off"):
        raise ValueError(
            f"data.fold_bn={configured!r} — expected 'auto', 'on' or "
            "'off'")
    return configured != "off"


def make_inference_fn(config: VoxelNetConfig, mesh=None,
                      platform: str | None = None):
    """Full single-graph inference: raw padded points -> NMS detections.

    Returns fn(variables, points (B, N, 4), num_points (B,)) -> Detections.
    Everything — voxelization included — runs inside one jitted graph.
    With the fused VFE backend (resolve_vfe_backend) the voxel table build
    + VFE stack run as one Pallas kernel and the middle/RPN submodules are
    applied directly; the XLA path applies the whole VoxelNet module.

    `mesh`: required when the config batch-shards ('data'/'dcn' > 1) and
    the fused backend is selected — the kernel then runs under shard_map
    over the batch axes (kernels/vfe_fused.voxelize_vfe_fused_sharded).
    `platform`: execution platform override for the backend resolves;
    defaults to the mesh's devices (or the ambient mesh / default
    backend — execution_platform).
    """
    platform = execution_platform(mesh=mesh, platform=platform)
    fold_bn = resolve_fold_bn(config)
    model = build_model(config, platform, fold_bn=fold_bn)
    spec = VoxelGridSpec.from_object_config(config.object)
    flat_anchors = jnp.asarray(anchor_ops.anchors_flat(config.object))
    obj, rpn_cfg = config.object, config.rpn
    backend = resolve_backend(config.data.voxelizer_backend)
    vfe_backend = resolve_vfe_backend(config, platform)
    interpret = platform != "tpu"  # Pallas interpreter off-TPU
    dense_backend = resolve_dense_build(config, platform)

    middle_backend = resolve_middle_backend(config, platform)
    sys_cfg = config.system
    num_dcn = getattr(sys_cfg, "num_dcn_shards", 1)
    batch_sharded = sys_cfg.num_data_shards * num_dcn > 1
    if vfe_backend == "fused" and batch_sharded and mesh is None:
        if config.data.vfe_backend == "auto":
            # single-device callers (cli.predict, bench, A/B dumps) may
            # load a sharded training config without building a mesh —
            # auto must degrade to XLA, not fail the build
            vfe_backend = "xla"
        else:
            raise ValueError(
                "make_inference_fn: batch-sharded config with the "
                "explicit fused VFE backend needs the mesh argument "
                "(shard_map)")
    fused_batch_axes = (("dcn", "data") if num_dcn > 1 else ("data",))

    def forward_fused(variables, points, num_points):
        from voxelnet_tpu.kernels.vfe_fused import (
            voxelize_vfe_fused, voxelize_vfe_fused_sharded)

        if batch_sharded:
            vw, coords, counts = voxelize_vfe_fused_sharded(
                points, num_points, spec, config.data.max_voxels,
                variables["params"]["feature_net"],
                variables["batch_stats"]["feature_net"],
                mesh=mesh, batch_axes=fused_batch_axes,
                interpret=interpret)
        else:
            vw, coords, counts = voxelize_vfe_fused(
                points, num_points, spec, config.data.max_voxels,
                variables["params"]["feature_net"],
                variables["batch_stats"]["feature_net"],
                interpret=interpret)
        if middle_backend in ("sparse1", "sparsebwd"):
            dense = (vw, coords, counts)
        elif middle_backend == "folded2d":
            dense = scatter_to_dense_folded(
                vw, coords, counts, config.object.grid_size)
        elif dense_backend == "pallas":
            # fused-kernel coords come from the same sorted run analysis
            dense = scatter_to_dense_streamed(
                vw, coords, counts, config.object.grid_size,
                interpret=interpret)
        else:
            dense = scatter_to_dense(
                vw, coords, counts, config.object.grid_size,
                indices_sorted=config.data.scatter_hints)
        dtype = jnp.dtype(config.train.compute_dtype)
        bev = MiddleLayers(dtype=dtype, backend=middle_backend,
                           depth_in=config.object.grid_size[0],
                           grid_hw=tuple(config.object.grid_size[1:]),
                           scatter_hints=config.data.scatter_hints,
                           fold_bn=fold_bn).apply(
            {"params": variables["params"]["middle"],
             "batch_stats": variables["batch_stats"]["middle"]},
            dense, False)
        return RPN(block1_stride=config.rpn.block1_stride,
                   dtype=dtype, fold_bn=fold_bn).apply(
            {"params": variables["params"]["rpn"],
             "batch_stats": variables["batch_stats"]["rpn"]},
            bev, False)

    def fn(variables, points, num_points) -> Detections:
        if fold_bn:
            # in-graph param transform: per-channel elementwise on the
            # conv kernels, negligible next to the convs themselves
            from voxelnet_tpu.models.bn_fold import fold_bn_variables

            variables = fold_bn_variables(variables)
        if vfe_backend == "fused":
            cls_logits, reg = forward_fused(variables, points, num_points)
        else:
            vox: Voxels = voxelize_batch_jax(
                points, num_points, spec, config.data.max_voxels, backend)
            cls_logits, reg = model.apply(
                variables, vox.features, vox.coords, vox.counts,
                train=False)
        probs = jax.nn.sigmoid(cls_logits)

        b = probs.shape[0]
        boxes = box_coding.decode_deltas(
            reg.reshape(b, -1, 7), flat_anchors, obj.anchor_h,
            yaw_mode=config.train.yaw_encoding)
        flat_probs = probs.reshape(b, -1)

        def one(bx, sc):
            return nms.nms_bev(
                bx, sc,
                score_thresh=rpn_cfg.score_thres,
                iou_thresh=rpn_cfg.nms_thres,
                pre_topk=rpn_cfg.nms_pre_topk,
                post_topk=rpn_cfg.nms_post_topk,
                mode=rpn_cfg.nms_mode,
                platform=platform)

        res = jax.vmap(one)(boxes, flat_probs)
        return Detections(res.boxes, res.scores, res.valid)

    return fn


def make_forward_fn(config: VoxelNetConfig, train: bool = False):
    """Voxel-buffers-in forward (the data pipeline already voxelized)."""
    model = build_model(config)

    def fn(variables, features, coords, counts):
        if train:
            return model.apply(
                variables, features, coords, counts, train=True,
                mutable=["batch_stats"])
        return model.apply(variables, features, coords, counts, train=False)

    return fn


def param_count(variables) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree.leaves(variables["params"]))
