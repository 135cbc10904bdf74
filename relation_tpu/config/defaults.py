"""Default configuration tree + YAML overlay.

Schema-compatible with the reference's config layer
(reference: relation_rcnn/config/config.py:18-198): the same key names, the same
layering (hard defaults -> YAML overlay with strict key-existence validation), so the
reference's ``experiments/relation_rcnn/cfgs/*.yaml`` files load unmodified.

TPU-native additions live under ``config.TPU`` (static-shape bucketing, dtype policy,
mesh axes); every addition has a safe default so reference YAMLs need no edits.
"""

from __future__ import annotations

import numpy as np
import yaml

from relation_tpu.utils.attrdict import AttrDict


def default_config() -> AttrDict:
    config = AttrDict()

    config.MXNET_VERSION = ""  # accepted for YAML compatibility; unused
    config.output_path = ""
    config.symbol = ""
    config.gpus = ""  # accepted for YAML compatibility; device count comes from JAX
    config.CLASS_AGNOSTIC = True
    config.SCALES = [(600, 1000)]  # (short side, max long side)

    config.default = AttrDict()
    config.default.frequent = 20
    config.default.kvstore = "device"  # unused; DP gradient allreduce is XLA psum

    # network related params (reference config.py:33-47)
    network = config.network = AttrDict()
    network.pretrained = ""
    network.pretrained_epoch = 0
    network.PIXEL_MEANS = np.array([0, 0, 0])
    network.IMAGE_STRIDE = 0
    network.RPN_FEAT_STRIDE = 16
    network.RCNN_FEAT_STRIDE = 16
    network.FIXED_PARAMS = ["gamma", "beta"]
    network.FIXED_PARAMS_SHARED = ["gamma", "beta"]
    network.ANCHOR_SCALES = (8, 16, 32)
    network.ANCHOR_RATIOS = (0.5, 1, 2)
    network.NUM_ANCHORS = len(network.ANCHOR_SCALES) * len(network.ANCHOR_RATIOS)
    network.ROIDispatch = False
    network.USE_NONGT_INDEX = False
    network.NMS_TARGET_THRESH = "0.5"

    # dataset related params (reference config.py:50-56)
    dataset = config.dataset = AttrDict()
    dataset.dataset = "PascalVOC"
    dataset.image_set = "2007_trainval"
    dataset.test_image_set = "2007_test"
    dataset.root_path = "./data"
    dataset.dataset_path = "./data/VOCdevkit"
    dataset.NUM_CLASSES = 21
    dataset.proposal = "rpn"
    # directory of cached RPN proposal pkls for the separate-RCNN workflow
    # (the FPN cfgs set this; reference config.py has no default — its
    # update_config admits unknown NESTED keys silently, config.py:188-189.
    # We validate recursively instead, so the key needs a default.)
    dataset.proposal_cache = ""

    TRAIN = config.TRAIN = AttrDict()
    TRAIN.lr = 0
    TRAIN.lr_step = ""
    TRAIN.lr_factor = 0.1
    TRAIN.warmup = False
    TRAIN.warmup_lr = 0
    TRAIN.warmup_step = 0
    TRAIN.momentum = 0.9
    TRAIN.wd = 0.0005
    TRAIN.begin_epoch = 0
    TRAIN.end_epoch = 0
    TRAIN.model_prefix = ""
    TRAIN.rpn_loss_scale = 3.0
    TRAIN.nms_loss_scale = 1.0
    TRAIN.nms_pos_scale = 4.0

    TRAIN.ALTERNATE = AttrDict()
    TRAIN.ALTERNATE.RPN_BATCH_IMAGES = 0
    TRAIN.FC_DROPOUT_RATIO = 0
    TRAIN.ATTENTION_DROPOUT_RATIO = 0
    TRAIN.ATTENTION_SCALE_METHOD = 0
    TRAIN.RESUME = False
    TRAIN.FLIP = True
    TRAIN.SHUFFLE = True
    TRAIN.ENABLE_OHEM = False
    TRAIN.BATCH_IMAGES = 2
    TRAIN.END2END = False
    TRAIN.ASPECT_GROUPING = True

    # R-CNN sampling (reference config.py:96-108)
    TRAIN.TOP_ROIS = -1
    TRAIN.BATCH_ROIS = 128
    TRAIN.BATCH_ROIS_OHEM = 128
    TRAIN.FG_FRACTION = 0.25
    TRAIN.FG_THRESH = 0.5
    TRAIN.BG_THRESH_HI = 0.5
    TRAIN.BG_THRESH_LO = 0.0
    TRAIN.BBOX_REGRESSION_THRESH = 0.5
    TRAIN.BBOX_WEIGHTS = np.array([1.0, 1.0, 1.0, 1.0])

    # RPN anchor sampling (reference config.py:110-120)
    TRAIN.RPN_BATCH_SIZE = 256
    TRAIN.RPN_FG_FRACTION = 0.5
    TRAIN.RPN_POSITIVE_OVERLAP = 0.7
    TRAIN.RPN_NEGATIVE_OVERLAP = 0.3
    TRAIN.RPN_CLOBBER_POSITIVES = False
    TRAIN.RPN_BBOX_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    TRAIN.RPN_POSITIVE_WEIGHT = -1.0

    # end2end RPN proposal (reference config.py:122-128)
    TRAIN.CXX_PROPOSAL = True  # accepted; both paths are the same on-device op here
    TRAIN.RPN_NMS_THRESH = 0.7
    TRAIN.RPN_PRE_NMS_TOP_N = 12000
    TRAIN.RPN_POST_NMS_TOP_N = 2000
    TRAIN.RPN_MIN_SIZE = network.RPN_FEAT_STRIDE
    TRAIN.BBOX_NORMALIZATION_PRECOMPUTED = False
    TRAIN.BBOX_MEANS = (0.0, 0.0, 0.0, 0.0)
    TRAIN.BBOX_STDS = (0.1, 0.1, 0.2, 0.2)
    TRAIN.LEARN_NMS = False
    TRAIN.JOINT_TRAINING = False
    TRAIN.FIRST_N = 100

    TEST = config.TEST = AttrDict()
    TEST.HAS_RPN = False
    TEST.BATCH_IMAGES = 1
    TEST.TOP_ROIS = 2000
    TEST.CXX_PROPOSAL = True
    TEST.RPN_NMS_THRESH = 0.7
    TEST.RPN_PRE_NMS_TOP_N = 6000
    TEST.RPN_POST_NMS_TOP_N = 300
    TEST.RPN_MIN_SIZE = network.RPN_FEAT_STRIDE
    TEST.PROPOSAL_NMS_THRESH = 0.7
    TEST.PROPOSAL_PRE_NMS_TOP_N = 20000
    TEST.PROPOSAL_POST_NMS_TOP_N = 2000
    TEST.PROPOSAL_MIN_SIZE = network.RPN_FEAT_STRIDE
    TEST.SOFTNMS = False
    TEST.LEARN_NMS = False
    TEST.FIRST_N = 0
    TEST.MERGE_METHOD = -1
    TEST.NMS = 0.3
    TEST.max_per_image = 300
    TEST.test_epoch = 0
    TEST.LEARN_NMS_CLASS_SCORE_TH = 0.01
    # per-detection score floor at eval (the reference test.py --thresh flag,
    # default 1e-3, reference test.py:31 + tester.py:230)
    TEST.SCORE_THRESH = 1e-3

    # ---- TPU-native extensions (not present in the reference) ----
    TPU = config.TPU = AttrDict()
    # Fixed image buckets (H, W); every image is resized per SCALES then zero-padded
    # to the smallest bucket that fits.  One compiled program per bucket.
    TPU.IMAGE_BUCKETS = [(608, 1024), (800, 1024), (1024, 1024)]
    # Max ground-truth boxes per image after padding (COCO max is 93 in train2017).
    TPU.MAX_GT = 100
    # Compute dtype for conv/matmul heavy paths ("bfloat16" or "float32").
    TPU.COMPUTE_DTYPE = "bfloat16"
    # Compute dtype for the ROI-head FCs + relation attention matmuls
    # (softmax / cls_score / bbox_pred always run f32). Default float32: the
    # reference head is f32 and mAP parity of a bf16 head is unmeasured in
    # this environment — bf16 is an opt-in speed knob (costs ~0.2 ms e2e).
    TPU.HEAD_DTYPE = "float32"
    # Mesh axis name for data parallelism.
    TPU.MESH_DATA_AXIS = "data"
    # Exact on-device greedy NMS: iterate suppression to fixpoint.
    TPU.NMS_EXACT = True
    # feed images as space-to-depth planar [12, H/2, W/2] (dense device layout;
    # an NHWC [H, W, 3] image is lane-padded 3->128, ~1 ms per touch at 608x1024)
    TPU.S2D_INPUT = True
    # Ship eval images host->device as uint8 (4x fewer bytes; the per-image
    # H2D serializes the device stream through this environment's tunnel,
    # measured 7.4 -> 15.3 img/s) with exact mean-sub + pad-zeroing on device
    # (core/predictor._image_from_u8). uint8->f32 is exact so detections are
    # bit-identical to the host-side f32 path.
    TPU.H2D_UINT8 = True
    # Sinusoid dtype for the XLA geometric-bias path ("bfloat16" | "float32").
    # Only the XLA-only dense attention (FPN learned-NMS tail, where the fused
    # Pallas bias kernel is s2b-poison) materializes the [C, 64, N, N]
    # embedding; bf16 halves that HBM-bound intermediate. sin/cos lie in
    # [-1, 1] so the cast costs < 0.4% relative pre-log (measured score-delta
    # bound in tests/test_models.py); parity eval of converted reference
    # weights flips this to "float32" (experiments/test.py __meta__ handling,
    # same policy as ROI_METHOD / FPN_TOPK). The C4 fast path is unaffected
    # (fused f32-accurate kernel).
    TPU.GEOM_EMB_DTYPE = "bfloat16"
    # XLA-only learned-NMS attention (FPN): when the inference class filter
    # leaves at most this many active classes, gather them into a compact
    # batch before the dense attention (the XLA analogue of the Pallas skip
    # kernel; the reference shrinks its attention batch the same way,
    # operator_py/learn_nms.py:296-309). 0 disables the compact path.
    TPU.NMS_COMPACT_CLASSES = 32
    # Persistent XLA compilation cache directory ("" = off). One compile per
    # (program, bucket) per MACHINE instead of per process — reruns, the
    # eval-after-train handoff, and multi-bucket sweeps deserialize compiled
    # executables from disk (utils/compile_cache.py; measured in
    # tools/bench_multibucket.py). Env var RELATION_TPU_COMPILE_CACHE wins.
    TPU.COMPILE_CACHE_DIR = ""
    # Eval loop: in-flight device-result window (async D2H pipelining) and
    # per-stage telemetry cadence (images between data/net/fetch/post logs).
    TPU.EVAL_PIPELINE_DEPTH = 8
    TPU.EVAL_LOG_EVERY = 200
    # ROI feature extraction: "align" (MXU ROIAlign, TPU default) or "pool"
    # (exact MXNet ROIPooling semantics for reference parity).
    TPU.ROI_METHOD = "align"
    # DCN deformable-PSROI pooling compute dtype ("bfloat16" | "float32").
    # bf16 halves the separable-einsum traffic (head backward 8.0 ms/img at
    # B=4 in f32, r5 legs); parity eval of converted reference weights flips
    # this to "float32" (experiments/test.py __meta__ handling).
    TPU.DCN_POOL_DTYPE = "bfloat16"
    # C4 learned-NMS attention implementation: "pallas" (fused geom-bias /
    # per-class skip kernels — the measured inference fast path) or "xla"
    # (the batched dense/compact attention). Train-step A/B lever: under the
    # train vmap the per-class kernel becomes B*C sequential grid programs.
    TPU.LNMS_ATTN = "pallas"
    # FPN proposal pre-NMS top-k over the ~622k pyramid anchors: "approx"
    # (lax.approx_max_k, recall 0.999, 385 us) or "exact" (lax.top_k — a full
    # sort on TPU, ~920 us). Parity eval of converted reference weights flips
    # this to "exact" (experiments/test.py meta handling, like ROI_METHOD).
    TPU.FPN_TOPK = "approx"
    # Fused VMEM-resident res4b1..22 Pallas stack (ops/pallas/res4.py).
    # Default OFF: on v5e at 608x1024 the custom call breaks XLA's
    # space-to-batch conv rewrites upstream (~423 MB of wrapper copies,
    # +1 ms e2e) for a kernel that only wins ~80 us over XLA's own stack —
    # see core/predictor.py::prepare_res4_folded.
    TPU.FUSE_RES4 = False
    # Global-norm gradient clipping (0 = off, reference behavior). Useful when
    # training from random init where the reference always starts pretrained.
    TPU.GRAD_CLIP = 0.0
    # FPN learned-NMS inference as TWO device programs: module 1 = trunk +
    # pyramid + proposals + head (XLA-only, keeps the stride-4/8 convs'
    # space-to-batch rewrites), module 2 = learned-NMS tail with the fused
    # Pallas geometry-bias/skip kernels (custom calls quarantined in their own
    # XLA module, so they cannot poison module 1 — the round-3 verdict's
    # untested escape from the 2.27 ms XLA-dense tail floor). Dispatch is
    # async, so the second launch overlaps the first through the stream.
    # Measured (tools/bench_variants.py fpn_split, round 4): dense worst case
    # 6.89 ms/image vs 7.67 single-module, 16 active classes 6.23 vs 6.31 —
    # never worse, so on by default.
    TPU.FPN_SPLIT_PREDICT = True
    # jax.checkpoint around the learned-NMS TRAIN branch (fwd recompute in the
    # backward instead of saved residuals). Off by default; kept as an A/B
    # lever for tools/microbench_train_cuts.py.
    TPU.LNMS_REMAT = False
    # FPN: allow the fused Pallas geometry-bias/attention kernels in the
    # model graph. False (default): all-XLA — on the PREDICT graph a Pallas
    # call downstream of the pyramid's stride-4/8 convs forfeits their
    # space-to-batch rewrites (+4.8 ms, round 1; the split-predict modules
    # re-enable Pallas safely). "lnms": the learned-NMS head only (its
    # [C, first_n, first_n] tiles are VMEM-safe) — the TRAIN-step lever for
    # the XLA-dense branch's 12.9 ms/img (r5 legs). True: also the head
    # relation modules — their [N, nongt] pair tiles VMEM-OOM the kernel at
    # FPN head shapes (measured r5); compile-time failure, not for use.
    TPU.FPN_ALLOW_PALLAS = False
    # Fire every bucket's first-call XLA compile from parallel threads at
    # pred_eval start (core/evaluator.prewarm_buckets). XLA compilation is
    # mostly off-GIL, so the ~25-40 s/bucket tunnel compiles overlap: measured
    # 77.7 s serial -> 45.6 s threaded for the 3 production buckets
    # (tools/bench_prewarm.py, round 4). Skipped automatically for small sets
    # (< 8 images/bucket) where lazy per-bucket compiles can be fewer.
    TPU.PREWARM_BUCKETS = True
    # In-graph monitor taps on the predict path (utils/debug.monitor — the
    # reference's operator_py/monitor_op.py identity, enabled by test.py
    # --debug). Logs shape + min/max/mean of rois, head scores and final
    # detections as the compiled program executes.
    TPU.DEBUG_MONITOR = False

    return config


def _merge(config: AttrDict, overlay: dict, path: str = "") -> None:
    """Overlay ``overlay`` onto ``config`` with key-existence validation at
    EVERY nesting level, mirroring reference ``update_config``
    (config.py:177-198, which raises on unknown keys wherever they appear) —
    a typo'd ``TRAIN.LEARN_NMs: true`` is an error, not a silent no-op."""
    for k, v in overlay.items():
        if k not in config:
            raise ValueError(
                f"key {path + k!r} must exist in the default config (reference "
                "config.py:198 raises the same way)")
        if isinstance(v, dict) and isinstance(config[k], AttrDict):
            _merge(config[k], v, path + k + ".")
        elif k in ("BBOX_WEIGHTS", "PIXEL_MEANS"):
            config[k] = np.array(v)
        elif k == "SCALES":
            config[k][0] = tuple(v)
        else:
            config[k] = v


def update_config(config: AttrDict, config_file: str) -> AttrDict:
    """Load a YAML experiment file onto ``config`` (in place) and return it."""
    with open(config_file) as f:
        exp = yaml.safe_load(f)
    _merge(config, exp)
    return config


def load_config(config_file: str | None = None) -> AttrDict:
    cfg = default_config()
    if config_file is not None:
        update_config(cfg, config_file)
    return cfg
