"""Configuration system.

Mirrors the key surface of the reference yacs config
(reference: voxelnet/config.py:4-119) — SYSTEM / DATA / TRAIN / VAL / IMAGE /
OBJECT / RPN / CALIB groups with per-class (Car / Pedestrian / Cyclist)
presets and derived grid fields — but as frozen dataclasses with YAML
override + snapshot-dump support, plus TPU-specific knobs the reference has
no analog for (static-shape buckets, compute dtype, mesh axes, NMS mode).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field, replace
from typing import Any, Mapping

import numpy as np

# Mean KITTI calibration matrices, used when a per-frame calib file is not
# available (reference: voxelnet/config.py:101-119).
_T_VELO_2_CAM = (
    (7.49916597e-03, -9.99971248e-01, -8.65110297e-04, -6.71807577e-03),
    (1.18652889e-02, 9.54520517e-04, -9.99910318e-01, -7.33152811e-02),
    (9.99882833e-01, 7.49141178e-03, 1.18719929e-02, -2.78557062e-01),
    (0.0, 0.0, 0.0, 1.0),
)
_R_RECT_0 = (
    (0.99992475, 0.00975976, -0.00734152, 0.0),
    (-0.0097913, 0.99994262, -0.00430371, 0.0),
    (0.00729911, 0.0043753, 0.99996319, 0.0),
    (0.0, 0.0, 0.0, 1.0),
)
_MATRIX_P2 = (
    (719.787081, 0.0, 608.463003, 44.9538775),
    (0.0, 719.787081, 174.545111, 0.1066855),
    (0.0, 0.0, 1.0, 3.0106472e-03),
    (0.0, 0.0, 0.0, 0.0),
)


@dataclass(frozen=True)
class SystemConfig:
    num_workers: int = 4
    # JAX mesh axis names for data / model parallelism. A mesh of size 1 on
    # either axis is free; the training step is written against these axes
    # from day one.
    mesh_axis_data: str = "data"
    mesh_axis_model: str = "model"
    num_data_shards: int = 1
    num_model_shards: int = 1
    # multi-host: number of DCN slices (processes); > 1 selects the
    # ('dcn', 'data', 'model') mesh — DCN major, ICI minor — and batches
    # shard over the joint ('dcn', 'data') axes (parallel/distributed.py)
    num_dcn_shards: int = 1


@dataclass(frozen=True)
class DataConfig:
    dir: str = "/data/kitti/MD_KITTI"
    calib_dir: str = "/data/kitti/KITTI/training/calib"
    # Static-shape buckets (TPU: ragged point/voxel counts must map to a small
    # fixed set of shapes so XLA never recompiles in steady state).
    max_points: int = 65536       # N bucket: points fed to the voxelizer
    # K bucket: occupied voxels kept per frame. Sized for crop_to_grid
    # pipelines: a raw KITTI frame's ~62k in-grid points occupy ~13.9k
    # voxels on the Car grid (the pre-crop pipeline's random point drop
    # masked this at ~11.2k) — 12288 would clip ~12% of real voxels with
    # a spatially biased (lowest-grid-id) subset. Costs ~2.4% inference
    # throughput vs 12288 (BASELINE.md).
    max_voxels: int = 16384
    max_gt_boxes: int = 64        # padded ground-truth boxes per frame
    shuffle_points: bool = True   # reference shuffles before voxelizing
                                  # (voxelnet/utils.py:35)
    # drop points outside the voxel grid BEFORE the max_points cap (same
    # float32 binning test as every voxelizer here, ops/voxelize.
    # in_grid_mask). The ragged reference crops inside its voxelizer with
    # no cap (voxelnet/utils.py:36-42); with a static cap, cropping first
    # stops out-of-grid points from crowding in-grid ones out of the
    # bucket (a raw 360-degree cloud is ~123k points, only ~55-60%
    # in-grid for Car — uncropped, the 65536 cap randomly drops ~47% of
    # the useful points).
    crop_to_grid: bool = True
    # 'auto' currently resolves to 'xla' everywhere (the Pallas run-copy
    # kernel is correct but loses to XLA's scatters under Mosaic's lane
    # padding — see ops/voxelize.resolve_backend); explicit 'xla' /
    # 'gather' (table built as K contiguous (T,4) run-slice gathers off
    # the sorted stream instead of a per-point row scatter) / 'pallas' /
    # 'pallas_interpret' override.
    voxelizer_backend: str = "auto"
    # inference VFE path: 'auto' | 'xla' | 'fused' — 'fused' runs the
    # single Pallas voxelize+VFE kernel (kernels/vfe_fused.py, 2.5x the
    # XLA stage on v5e); 'auto' selects it on TPU for unsharded graphs
    vfe_backend: str = "auto"
    # explicit-table (train/eval) VFE path: 'auto' | 'xla' | 'planar'.
    # 'planar' keeps the voxel table in the Pallas run-copy's voxel-major
    # (B, C, T, K) layout (7.6 vs 29.7 ms/batch8 table build on v5e) and
    # runs the VFE there (models/vfe_planar.py — identical math + param
    # tree); 'xla' is the row-scatter (B, K, T, C) path. 'auto' picks the
    # measured winner per backend (models.voxelnet.
    # resolve_train_vfe_backend).
    train_vfe_backend: str = "auto"
    # depth->BEV fold at the middle/RPN junction: 'auto' | 'transpose' |
    # 'dsplit'. 'dsplit' absorbs the c-major fold into the first RPN
    # conv's kernel (rpn._BEVFoldConv) so the fold transpose never
    # materializes; identical math + parameter tree. 'auto' picks the
    # measured winner (models.voxelnet.resolve_bev_fold).
    bev_fold: str = "auto"
    # middle-conv lowering: 'auto' | 'conv3d' | 'folded2d' | 'tap2d' |
    # 'sparse1' | 'sparsebwd' (conv3d forward bit-identical, block-1
    # backward via 27-site slice-gathers + MXU matmuls instead of the
    # dense transposed-conv pair — training-path lever, see
    # models/sparse_conv.conv3x3_sparsebwd) | 'wpack' (two adjacent W
    # positions per output row — full 128-wide MXU tiles at 4/3 the
    # MACs, models/middle._WPackConv).
    # All are mathematically identical with one shared
    # parameter tree (models/middle.py): 'folded2d' = ONE block-banded
    # Conv2D with depth folded into channels (Din/3 x FLOPs, biggest
    # contractions); 'tap2d' = 3 depth-tap Conv2Ds over the merged
    # (B, D') batch (FLOP-neutral); 'sparse1' = block 1 computed
    # input-stationarily off the (B, K, C) voxel table, skipping the
    # C=128 dense scatter entirely (models/sparse_conv.py; no spatial
    # sharding). 'auto' picks the measured winner per backend
    # (BASELINE.md MFU ladder).
    middle_backend: str = "auto"
    # host-pipeline voxelizer used when train.host_voxelize feeds voxel
    # buffers from the data threads: 'auto' | 'native' | 'numpy'.
    # 'native' is the C++ fast path (voxelnet_tpu/native, ~20x the NumPy
    # twin — on this 1-core host the NumPy twin alone caps the pipeline
    # at ~10 f/s, under the device's 36 f/s); 'auto' selects it whenever
    # the g++-built library loads, else falls back to NumPy.
    host_voxelizer: str = "auto"
    # pass XLA scatter hints (indices_are_sorted + unique_indices) to the
    # sparse->dense grid build: 18.0 -> 12.4 ms/batch8 on v5e
    # (scripts/probe_scatter.py). Sound because every framework voxelizer
    # emits occupied voxels in ascending (z*H+y)*W+x order with padding
    # trailing; disable when feeding the model voxel buffers from any
    # other producer.
    scatter_hints: bool = True
    # in-RAM frame cache budget (MB, 0 = off): after the first epoch the
    # pipeline skips the per-frame .bin read (and the grid crop when
    # augmentation is off — the cached entry is already cropped). Fill
    # until the budget, then pass-through — no eviction (epoch-cyclic
    # access would thrash an LRU). 512 MB holds ~170 cropped Car frames;
    # full KITTI training (3712 frames) partially fits, which still
    # saves that fraction of host work. The reference re-reads every
    # file every epoch (voxelnet/dataset.py:50-51).
    cache_frames_mb: int = 512
    # sparse->dense grid lowering: 'auto' | 'scatter' | 'pallas'.
    # 'scatter' = XLA zero-init + row scatter (with scatter_hints);
    # 'pallas' = the streaming block-fill kernel (kernels/dense_build.py
    # — every grid byte written exactly once at streaming DMA sizes;
    # requires the voxelizer-sorted buffer order, an unsharded graph,
    # and shapes where a block size divides D*H*W). Measured EQUAL to
    # the scatter on v5e (both ~245 GB/s effective — BASELINE.md), so
    # 'auto' -> 'scatter' (models.voxelnet.resolve_dense_build).
    dense_build: str = "auto"
    # eval-time BatchNorm folding in the INFERENCE graph: 'auto' | 'on' |
    # 'off'. BN is affine at eval; folding the affine into each conv's
    # kernel/bias (models/bn_fold.py) deletes every middle/RPN BN op and
    # its f32-convert/layout-copy boundary (the residual non-conv cost
    # in profiles/trace_r3b.md). Platform-independent graph algebra —
    # 'auto' = on; identical math up to bf16 rounding of the scaled
    # kernels (equivalence-tested, tests/test_bn_fold.py). Train/eval
    # LOSS graphs are untouched (they need live batch statistics).
    fold_bn: str = "auto"


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 2
    num_workers: int = 8
    lr: float = 0.01
    lr_scheduler_step: int = 150      # epoch at which LR drops 10x
    alpha: float = 1.5                # positive-class CE weight
    beta: float = 1.0                 # negative-class CE weight
    sigma: float = 3.0                # smooth-L1 transition sharpness
    num_epochs: int = 10
    gradient_clip: float = 5.0
    augment: bool = False             # reference defines but disables
                                      # augmentation (voxelnet/train.py:65,72)
    seed: int = 0
    # bfloat16 compute for conv/matmul heavy stages; params stay f32.
    compute_dtype: str = "bfloat16"
    checkpoint_every_epochs: int = 1
    keep_checkpoints: int = 1000      # reference keeps every epoch
    debug_nans: bool = False          # jax_debug_nans toggle (sanitizer knob)
    # assign anchor targets on the input-pipeline threads (overlapped with
    # device compute) instead of inside the jitted step — the targets
    # depend only on (gt_boxes, anchors), not params. Default OFF: the
    # precomputed maps add ~20 MB/batch8 of H2D traffic to save 6.4 ms of
    # device compute, a bad trade on any host-device link under ~3 GB/s —
    # measured end-to-end on the tunneled dev chip it is the difference
    # between 1.8 and 24 frames/sec (scripts/probe_pipeline.py,
    # BASELINE.md). Turn on only when the host link is direct PCIe AND
    # host cores are plentiful.
    host_targets: bool = False
    # voxelize on the input-pipeline threads and feed voxel buffers to
    # the train step (the in-graph XLA voxelizer — ~29.5 ms/batch8 of
    # table scatter — drops out: 31.4 -> 36.0 f/s device-side on v5e).
    # Opt-in, and only worth it on a direct-PCIe host: the (B, K, T, 7)
    # buffers are ~96 MB/batch8 of H2D traffic (vs 8 MB of raw points),
    # which drowns the 32 ms device win on a thin link
    # (scripts/probe_pipeline.py, BASELINE.md end-to-end table). Host CPU
    # is no longer the constraint — the C++ voxelizer
    # (data.host_voxelizer='auto' -> voxelnet_tpu/native) does ~2.6
    # ms/frame vs the NumPy twin's ~41 ms.
    host_voxelize: bool = False
    # wire format of the per-step point upload: 'f32' (raw) | 'i16q'
    # (int16, xyz quantized at 5 mm + reflectance at 1/32768 — HALF the
    # H2D bytes on the link that bounds end-to-end training; the train
    # step dequantizes in-graph, ~free elementwise). 5 mm is 2.5% of the
    # smallest voxel edge (0.2 m) and ~1 ulp of f32 at x=70 m — well
    # under the sensor's own noise — so binning/AP effects are nil
    # (equivalence-tested, tests/test_train.py). Default 'i16q': on the
    # H2D-bound end-to-end loop it measured 20.5 -> 22.9 f/s @B8
    # (25.1 with staging depth 3 — BASELINE.md round-4 table). Set
    # 'f32' for bit-identical parity with the reference pipeline.
    upload_points: str = "i16q"
    # batches device_put ahead of the running step: deeper staging keeps
    # more H2D transfers in flight on the thin tunnel link (i16q e2e
    # 22.9 f/s at depth 2 -> 25.1 at depth 3, BASELINE.md round 4)
    staging_depth: int = 3
    # yaw regression encoding: 'delta' (reference semantics, dr =
    # gt_r - anchor_r, voxelnet/utils.py:487) or 'sin' (SECOND-style
    # dr = sin(gt_r - anchor_r), decode r = anchor_r + arcsin(dr)).
    # A BEV rectangle at r and r - pi is the same shape, so with raw
    # deltas two visually identical boxes can carry targets differing
    # by pi and the regressor learns their mean — boxes near the
    # +-pi/2 boundary come out ~90 deg rotated (measured on the
    # synthetic uniform-yaw scenes: 35/48 missed cars had |r| > 0.9,
    # BASELINE.md round 5). 'sin' removes the ambiguity; rotated IoU /
    # AP are pi-symmetric so only orientation-direction metrics (AOS)
    # see the residual flip. Default 'delta' for reference parity.
    yaw_encoding: str = "delta"
    # stage (host-batch wait + device_put issue) on a background thread
    # so the ~40 ms/batch of client work overlaps step dispatch
    # (measured +4% e2e on the 1-core dev host, BASELINE.md round 5).
    # Ignored multi-host: processes must interleave staging with their
    # collective steps identically (trainer._staged_batches).
    staging_thread: bool = True
    # rematerialization of the train-step forward: 'none' keeps XLA's
    # default residual saving; 'seams' wraps the model apply in
    # jax.checkpoint saving ONLY the named seams (the (B,K,128) voxel
    # table and the BEV map — models/voxelnet.py checkpoint_name calls),
    # so the (B,10,400,352,128) dense grid and every conv intermediate
    # are recomputed in backward instead of held in HBM; 'full' saves
    # nothing. Measured on v5e (BASELINE.md round-5 remat ladder):
    # default-graph training fits through B16 WITHOUT remat (36.6 f/s;
    # B8 37.7 is the sweet spot), remat costs ~22% recompute, and B24
    # OOMs under any policy (the dense grid + its gradient alone are
    # ~17.2 GB in block-1's backward) — so 'none' is right for this
    # model on this chip; the knob is the HBM escape hatch for
    # deeper/wider variants or smaller-HBM parts.
    remat: str = "none"


@dataclass(frozen=True)
class ValConfig:
    batch_size: int = 2
    num_workers: int = 4


@dataclass(frozen=True)
class ImageConfig:
    width: int = 1242
    height: int = 375
    channels: int = 3


@dataclass(frozen=True)
class ObjectConfig:
    """Per-class detection geometry (reference: voxelnet/config.py:35-92)."""

    name: str = "Car"
    z_min: float = -3.0
    z_max: float = 1.0
    y_min: float = -40.0
    y_max: float = 40.0
    x_min: float = 0.0
    x_max: float = 70.4
    z_voxel_size: float = 0.4
    y_voxel_size: float = 0.2
    x_voxel_size: float = 0.2
    points_per_voxel: int = 35
    feature_ratio: int = 2
    anchor_l: float = 3.9
    anchor_w: float = 1.6
    anchor_h: float = 1.56
    anchor_z: float = -1.0 - 1.56 / 2
    rpn_pos_iou: float = 0.6
    rpn_neg_iou: float = 0.45
    anchors_per_cell: int = 2   # yaw 0 and 90 degrees

    @property
    def depth(self) -> int:
        return int(round((self.z_max - self.z_min) / self.z_voxel_size))

    @property
    def height(self) -> int:
        return int(round((self.y_max - self.y_min) / self.y_voxel_size))

    @property
    def width(self) -> int:
        return int(round((self.x_max - self.x_min) / self.x_voxel_size))

    @property
    def feature_height(self) -> int:
        return self.height // self.feature_ratio

    @property
    def feature_width(self) -> int:
        return self.width // self.feature_ratio

    @property
    def grid_size(self) -> tuple[int, int, int]:
        """(D, H, W) voxel grid extents in (z, y, x) order."""
        return (self.depth, self.height, self.width)

    @property
    def voxel_size_zyx(self) -> tuple[float, float, float]:
        return (self.z_voxel_size, self.y_voxel_size, self.x_voxel_size)

    @property
    def lidar_offset(self) -> tuple[float, float, float]:
        """Shift applied to (x, y, z) so grid indices start at 0."""
        return (-self.x_min, -self.y_min, -self.z_min)

    @property
    def num_anchors(self) -> int:
        return self.feature_height * self.feature_width * self.anchors_per_cell


def _car_object() -> ObjectConfig:
    return ObjectConfig()


def _pedestrian_object() -> ObjectConfig:
    return ObjectConfig(
        name="Pedestrian",
        y_min=-20.0, y_max=20.0, x_min=0.0, x_max=48.0,
        points_per_voxel=45,
        anchor_l=0.8, anchor_w=0.6, anchor_h=1.73,
        anchor_z=-0.6 - 1.73 / 2,
        rpn_pos_iou=0.5, rpn_neg_iou=0.35,
    )


def _cyclist_object() -> ObjectConfig:
    return ObjectConfig(
        name="Cyclist",
        y_min=-20.0, y_max=20.0, x_min=0.0, x_max=48.0,
        points_per_voxel=45,
        anchor_l=1.76, anchor_w=0.6, anchor_h=1.73,
        anchor_z=-0.6 - 1.73 / 2,
        rpn_pos_iou=0.5, rpn_neg_iou=0.35,
    )


OBJECT_PRESETS = {
    "Car": _car_object,
    "Pedestrian": _pedestrian_object,
    "Cyclist": _cyclist_object,
}


@dataclass(frozen=True)
class RPNConfig:
    nms_post_topk: int = 20
    nms_thres: float = 0.1
    score_thres: float = 0.96
    # Pre-NMS candidate cap — the static shape the on-device NMS runs over.
    # KITTI frames rarely exceed ~100 candidates above the 0.96 score
    # threshold; 256 keeps the (k, k) IoU matrix cheap.
    nms_pre_topk: int = 256
    # 'rotated' = true rotated-BEV IoU NMS on device (upgrade over the
    # reference's axis-aligned NMS, voxelnet/model.py:39-48);
    # 'standup' = reference-parity axis-aligned NMS.
    nms_mode: str = "rotated"
    # RPN first-block stride. The reference builds block1 with stride 1
    # for Pedestrian/Cyclist (voxelnet/model.py:221-227), which makes the
    # head output 2x the anchor grid — a latent shape bug (SURVEY.md §2);
    # every preset here uses 2. Set 1 (with object.feature_ratio=1 for
    # self-consistent shapes) to instantiate the reference's exact
    # non-Car topology for parity checks.
    block1_stride: int = 2


@dataclass(frozen=True)
class CalibConfig:
    t_velo_2_cam: tuple = _T_VELO_2_CAM
    r_rect_0: tuple = _R_RECT_0
    matrix_p2: tuple = _MATRIX_P2

    def T_VELO_2_CAM(self) -> np.ndarray:
        return np.asarray(self.t_velo_2_cam, dtype=np.float64)

    def R_RECT_0(self) -> np.ndarray:
        return np.asarray(self.r_rect_0, dtype=np.float64)

    def MATRIX_P2(self) -> np.ndarray:
        return np.asarray(self.matrix_p2, dtype=np.float64)


@dataclass(frozen=True)
class CompatConfig:
    """Documented deviations from reference bugs (SURVEY.md §2 quirks).

    Each flag defaults to the *corrected* semantics; flipping one reproduces
    the reference's buggy behavior for bit-level comparison.
    """

    # reference voxelnet/utils.py:217-225 emits zero-area anchor standup
    # boxes (x2/y2 use '-' where '+' is needed).
    buggy_anchor_standup: bool = False
    # reference voxelnet/loss.py:9-10 multiplies the two smooth-L1 branch
    # options instead of gating by sign.
    buggy_smooth_l1: bool = False
    # reference voxelnet/utils.py:344-373 adds +1 (pixel convention) to
    # metric box extents when computing IoU.
    iou_plus_one: bool = False
    # reference VFE padding semantics (voxelnet/model.py:74-79): BatchNorm
    # normalizes over padded points, and the per-voxel max-pool includes the
    # "ghost" activations the padded zero-rows produce through
    # Dense+ReLU+BN. Default False = mask-aware BN and masked max.
    bn_over_padding: bool = False
    # augmentation collision check: the reference rasterizes BEV polygons
    # with cv2.fillConvexPoly onto an IMAGE-sized (375x1242) buffer in
    # grid-index pixels (voxelnet/dataset.py:222-240) — int-truncated
    # corners, y rows >= IMAGE.HEIGHT clipped away. Default False = exact
    # rotated-rectangle IoU (data/augment.rotated_iou_2d).
    raster_collision: bool = False


@dataclass(frozen=True)
class VoxelNetConfig:
    system: SystemConfig = field(default_factory=SystemConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    val: ValConfig = field(default_factory=ValConfig)
    image: ImageConfig = field(default_factory=ImageConfig)
    object: ObjectConfig = field(default_factory=_car_object)
    rpn: RPNConfig = field(default_factory=RPNConfig)
    calib: CalibConfig = field(default_factory=CalibConfig)
    compat: CompatConfig = field(default_factory=CompatConfig)

    def replace(self, **kwargs) -> "VoxelNetConfig":
        return replace(self, **kwargs)

    # ---- serialization -------------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def dump_yaml(self) -> str:
        import yaml

        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "VoxelNetConfig":
        base = cls()
        return _merge_dataclass(base, d)

    def merge_from_file(self, path: str) -> "VoxelNetConfig":
        import yaml

        with open(path) as f:
            overrides = yaml.safe_load(f) or {}
        return _merge_dataclass(self, overrides)


def _merge_dataclass(obj, overrides: Mapping[str, Any]):
    """Recursively apply a nested dict of overrides to a frozen dataclass."""
    updates = {}
    field_names = {f.name for f in dataclasses.fields(obj)}
    for key, value in overrides.items():
        if key not in field_names:
            raise KeyError(
                f"Unknown config key {key!r} for {type(obj).__name__}")
        current = getattr(obj, key)
        if dataclasses.is_dataclass(current) and isinstance(value, Mapping):
            updates[key] = _merge_dataclass(current, value)
        else:
            updates[key] = value
    return replace(obj, **updates)


def get_config(class_name: str = "Car", **overrides) -> VoxelNetConfig:
    """Build a config for one of the KITTI classes.

    Analog of the reference's `get_cfg_defaults()`
    (voxelnet/config.py:125-129) plus the class switch the reference bakes in
    at import time (voxelnet/config.py:37-92).
    """
    if class_name not in OBJECT_PRESETS:
        raise ValueError(
            f"Unknown class {class_name!r}; expected one of "
            f"{sorted(OBJECT_PRESETS)}")
    cfg = VoxelNetConfig(object=OBJECT_PRESETS[class_name]())
    if overrides:
        cfg = _merge_dataclass(cfg, overrides)
    return cfg
