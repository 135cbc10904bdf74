"""pjit data-parallel trainer: one fused on-device train step.

Replaces the reference's training runtime (MutableModule.fit epoch loop,
core/module.py:993-1038; DataParallelExecutorGroup per-GPU executors + kvstore
'device' gradient reduce, core/module.py:473-518) with:

- a single jit region per step: backbone -> RPN -> anchor targets -> on-device
  proposals -> ROI sampling -> head (+relation) -> losses (+OHEM, +learned NMS) ->
  grads -> SGD update. No host round trips (the reference has 4 per step, SURVEY §3.1).
- data parallelism via a jax.sharding Mesh: batch sharded on the 'data' axis, params
  replicated; XLA emits the gradient all-reduce over ICI when differentiating the
  batch-mean loss (the kvstore-'device' equivalent).
- frozen parameters (network.FIXED_PARAMS prefix matching, reference
  core/module.py:753-773) as a gradient mask + weight-decay mask.
- SGD with momentum + weight decay and the WarmupMultiFactor schedule
  (lib/utils/lr_scheduler.py), rescale_grad 1/batch via batch-mean loss
  (core/module.py:479).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.traverse_util import flatten_dict

from relation_tpu.models.detector import RelationRCNN
from relation_tpu.models.rpn import generate_proposals
from relation_tpu.models.targets import (anchor_targets, sample_rois, ohem_select,
                                         nms_multi_target)
from relation_tpu.models.losses import (rpn_losses, rcnn_losses, learn_nms_losses,
                                        accuracy_ignore, nms_accuracy)
from relation_tpu.ops.anchors import generate_anchors, shift_anchors
from relation_tpu.utils.lr import warmup_multi_factor_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def _freeze_through(fixed_prefixes) -> int:
    """Deepest trunk stage s such that conv1 and res2..res_s are all fully
    covered by FIXED_PARAMS prefixes (reference prefix semantics: a param is
    frozen iff its name STARTS WITH a prefix, core/module.py:753-773 — so
    'res' covers every stage, 'res2' covers stage 2 only). Drives the
    stop_gradient boundary in ResNet101C4 (grad_req='null' analogue)."""
    def covered(name):
        return any(name.startswith(p) for p in fixed_prefixes)
    if not covered("conv1"):
        return 0
    return max((s for s in (2, 3, 4)
                if all(covered(f"res{t}") for t in range(2, s + 1))),
               default=0)


def build_model(cfg, tiny: bool = False):
    """Instantiate the detector from a reference-schema config (the registry
    replacing the reference's eval(config.symbol), train_end2end.py:65)."""
    threshes = np.fromstring(cfg.network.NMS_TARGET_THRESH, dtype=float, sep=",")
    common = dict(
        num_classes=cfg.dataset.NUM_CLASSES,
        num_anchors=cfg.network.NUM_ANCHORS,
        class_agnostic=cfg.CLASS_AGNOSTIC,
        # relation modules sit in the detection head only for the *_rcnn_attention
        # / *_dcn_attention / *_fpn_attention symbols; the learn-NMS-only variant
        # (resnet_v1_101_rcnn_learn_nms_1024_attention_...) has a plain 2FC head
        # (reference symbols/resnet_v1_101_rcnn_learn_nms_1024_*.py)
        use_relation=any(t in cfg.symbol for t in
                         ("rcnn_attention", "dcn_attention", "fpn_attention")),
        use_learn_nms=bool(cfg.TRAIN.LEARN_NMS or cfg.TEST.LEARN_NMS),
        first_n=int(cfg.TRAIN.FIRST_N),
        num_thresh=len(threshes),
        bbox_means=tuple(cfg.TRAIN.BBOX_MEANS) if cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED else None,
        bbox_stds=tuple(cfg.TRAIN.BBOX_STDS) if cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED else None,
        roi_method=str(cfg.TPU.get("ROI_METHOD", "align")),
        backbone="tiny" if tiny else "resnet101",
        head_dim=64 if tiny else 1024,
        # TPU.COMPUTE_DTYPE governs the conv trunk (bfloat16 on TPU; "float32"
        # is the strict-parity mode used by the multichip DP certificates)
        conv_dtype=(jnp.float32 if tiny or
                    str(cfg.TPU.get("COMPUTE_DTYPE", "bfloat16")) != "bfloat16"
                    else jnp.bfloat16),
        head_dtype=(jnp.float32 if tiny or
                    str(cfg.TPU.get("HEAD_DTYPE", "bfloat16")) != "bfloat16"
                    else jnp.bfloat16),
        geom_emb_dtype=(jnp.bfloat16 if not tiny and
                        str(cfg.TPU.get("GEOM_EMB_DTYPE", "bfloat16"))
                        == "bfloat16" else None),
        compact_classes=int(cfg.TPU.get("NMS_COMPACT_CLASSES", 32)),
        # grad_req='null' analogue: stop_gradient after the deepest fully-
        # frozen trunk stage so XLA DCEs conv1+res2 backward (the stride-4/8
        # stages; reference core/module.py:753-773). The optimizer mask
        # already zeroes these grads — numerics are unchanged, backward
        # bandwidth is not. freeze_through=2 requires res2 AND conv1 frozen.
        freeze_through=_freeze_through(cfg.network.FIXED_PARAMS),
    )
    if "fpn" in cfg.symbol:
        from relation_tpu.models.fpn import RelationRCNNFPN
        # TPU.FPN_ALLOW_PALLAS: False | True | "lnms" (learned-NMS head only
        # — the head relations' pair tiles VMEM-OOM the geom-bias kernel)
        ap = cfg.TPU.get("FPN_ALLOW_PALLAS", False)
        return RelationRCNNFPN(
            allow_pallas=(ap is True),
            allow_pallas_lnms=(ap is True or ap == "lnms"),
            **common)
    return RelationRCNN(
        dcn="dcn" in cfg.symbol,
        dcn_pool_dtype=(jnp.float32 if tiny or
                        str(cfg.TPU.get("DCN_POOL_DTYPE", "bfloat16"))
                        != "bfloat16" else jnp.bfloat16),
        # "pallas" (default, the inference fast path) | "xla" (the batched
        # dense/compact attention — train-step A/B, see detector.py)
        lnms_allow_pallas=(str(cfg.TPU.get("LNMS_ATTN", "pallas")) != "xla"),
        rcnn_feat_stride=int(cfg.network.RCNN_FEAT_STRIDE),
        **common,
    )


def trainable_mask(params, fixed_prefixes) -> Any:
    """True where trainable. A leaf is frozen if any path component starts with any
    FIXED_PARAMS prefix (reference module.py:753-773 matches name prefixes; gamma/
    beta/moving_* are the frozen-BN constants)."""
    always_frozen = ("gamma", "beta", "moving_mean", "moving_var")
    prefixes = tuple(fixed_prefixes) + always_frozen

    flat = flatten_dict(params)
    out = {}
    for path in flat:
        frozen = any(comp.startswith(p) for comp in path for p in prefixes)
        out[path] = not frozen
    from flax.traverse_util import unflatten_dict
    return unflatten_dict(out)


def make_optimizer(cfg, epoch_size: int, mask) -> optax.GradientTransformation:
    base_lr = float(cfg.TRAIN.lr)
    steps = [int(float(s) * epoch_size)
             for s in str(cfg.TRAIN.lr_step).split(",") if s.strip()]
    sched = warmup_multi_factor_schedule(
        base_lr, steps, float(cfg.TRAIN.lr_factor), bool(cfg.TRAIN.warmup),
        float(cfg.TRAIN.warmup_lr), int(cfg.TRAIN.warmup_step))
    # per-param lr multipliers: the DCN head 'offset' FC trains at 0.01x
    # (reference rcnn_dcn.py:866 lr_mult=0.01)
    def lr_mult_mask(params):
        from flax.traverse_util import flatten_dict, unflatten_dict
        flat = flatten_dict(params)
        return unflatten_dict({p: ("offset" in p) for p in flat})

    clip = float(cfg.TPU.get("GRAD_CLIP", 0.0))
    tx = optax.chain(
        optax.clip_by_global_norm(clip) if clip > 0 else optax.identity(),
        optax.masked(optax.add_decayed_weights(float(cfg.TRAIN.wd)), mask),
        optax.sgd(learning_rate=sched, momentum=float(cfg.TRAIN.momentum)),
        optax.masked(optax.scale(0.01), lr_mult_mask),
        optax.masked(optax.set_to_zero(), jax.tree.map(lambda t: not t, mask)),
    )
    return tx


def make_train_step(model: RelationRCNN, cfg, stop_after: str = "",
                    fixed_prefixes=None, no_grad: bool = False) -> Callable:
    """Build the per-batch train step; feature-grid shapes are static per
    compilation from the traced batch (one compiled program per image bucket,
    the MutableModule-rebinding analogue — see experiments/train.py).

    ``stop_after`` is a benchmarking cut (tools/microbench_train_cuts.py): stop
    the per-image graph after the named stage ('rpn', 'anchor_targets',
    'proposals', 'sample', 'pool', 'head', 'lnms_score', 'lnms_target') and
    train on the partial loss — the cumulative-cut methodology that found the
    FPN inference budget. '' = full.

    ``fixed_prefixes`` overrides cfg.network.FIXED_PARAMS for the grad_req=
    'null' stop-gradient set (benchmark cuts / the alternate workflow's
    FIXED_PARAMS_SHARED, reference function/train_rcnn.py:119-123).

    ``no_grad`` compiles the forward-only step (loss + metrics, params
    untouched) — the benchmarking anchor for backward-pass cost.
    """
    stride = int(cfg.network.RPN_FEAT_STRIDE)
    base_anchors = generate_anchors(stride, tuple(cfg.network.ANCHOR_RATIOS),
                                    tuple(cfg.network.ANCHOR_SCALES))
    nongt_dim = int(cfg.TRAIN.RPN_POST_NMS_TOP_N)
    batch_rois = int(cfg.TRAIN.BATCH_ROIS)
    num_reg = 2 if cfg.CLASS_AGNOSTIC else cfg.dataset.NUM_CLASSES
    threshes = tuple(np.fromstring(cfg.network.NMS_TARGET_THRESH, dtype=float,
                                   sep=","))
    ohem = bool(cfg.TRAIN.ENABLE_OHEM)
    learn_nms = bool(cfg.TRAIN.LEARN_NMS)
    if learn_nms and batch_rois >= 0:
        raise ValueError("LEARN_NMS requires take-all ROI mode (BATCH_ROIS=-1), "
                         "as in the reference configs")
    bbox_norm_denom = float(cfg.TRAIN.BATCH_ROIS_OHEM if ohem
                            else (300 if batch_rois < 0 else batch_rois))

    from relation_tpu.models.fpn import (RelationRCNNFPN, fpn_anchors,
                                         generate_proposals_fpn, FPN_STRIDES)
    is_fpn = isinstance(model, RelationRCNNFPN)

    pixel_means = tuple(float(m) for m in cfg.network.PIXEL_MEANS)
    if fixed_prefixes is None:
        fixed_prefixes = tuple(cfg.network.FIXED_PARAMS)

    def per_image(params, feat, rpn, im_info, gt_boxes, gt_valid, rng):
        """Everything after the (batched) conv trunk, for ONE image.

        ``feat``/``rpn``: this image's slice of the batched trunk outputs —
        C4: (head feat [h,w,256], (rpn_cls [h,w,2A], rpn_bbox [h,w,4A]));
        FPN: (pyramid dict, {stride: (cls, bbox)} dict)."""
        r_anchor, r_sample = jax.random.split(rng)
        if is_fpn:
            rpn_out = rpn
            # per-level grids concatenated in FPN_STRIDES order (the pyramid
            # analogue of assign_pyramid_anchor, lib/rpn/rpn.py:246-330)
            level_anchors = fpn_anchors(
                {s: rpn_out[s][0].shape[:2] for s in FPN_STRIDES},
                tuple(cfg.network.ANCHOR_SCALES), tuple(cfg.network.ANCHOR_RATIOS))
            anchors = jnp.concatenate([level_anchors[s] for s in FPN_STRIDES])
            # raw [h,w,2A]/[h,w,4A] conv layout: reshape(-1, {2,4}) gives the
            # same (h, w, a)-major rows as the old [h,w,A,{2,4}] unpack
            rpn_cls = jnp.concatenate(
                [rpn_out[s][0].astype(jnp.float32).reshape(-1, 2)
                 for s in FPN_STRIDES])
            rpn_bbox = jnp.concatenate(
                [rpn_out[s][1].astype(jnp.float32).reshape(-1, 4)
                 for s in FPN_STRIDES])
        else:
            rpn_cls, rpn_bbox = rpn
            fh, fw = rpn_cls.shape[0], rpn_cls.shape[1]
            anchors = shift_anchors(base_anchors, fh, fw, stride)

        if stop_after == "rpn":
            # grads still flow through the whole backbone+RPN
            tot = (jnp.mean(jnp.square(rpn_cls.astype(jnp.float32))) +
                   jnp.mean(jnp.square(rpn_bbox.astype(jnp.float32))))
            return tot, {"total_loss": tot}

        label, btgt, bwt = anchor_targets(
            anchors, gt_boxes, gt_valid, im_info, r_anchor,
            rpn_batch_size=int(cfg.TRAIN.RPN_BATCH_SIZE),
            fg_fraction=float(cfg.TRAIN.RPN_FG_FRACTION),
            positive_overlap=float(cfg.TRAIN.RPN_POSITIVE_OVERLAP),
            negative_overlap=float(cfg.TRAIN.RPN_NEGATIVE_OVERLAP),
            clobber_positives=bool(cfg.TRAIN.RPN_CLOBBER_POSITIVES),
            bbox_weights=tuple(cfg.TRAIN.RPN_BBOX_WEIGHTS))
        rpn_cls_flat = rpn_cls.reshape(-1, 2)
        rpn_bbox_flat = rpn_bbox.reshape(-1, 4)
        rpn_cls_loss, rpn_bbox_loss = rpn_losses(
            rpn_cls_flat, rpn_bbox_flat, label, btgt, bwt,
            int(cfg.TRAIN.RPN_BATCH_SIZE), sigma=float(cfg.TRAIN.rpn_loss_scale))

        if stop_after == "anchor_targets":
            tot = rpn_cls_loss + rpn_bbox_loss
            return tot, {"total_loss": tot}

        if is_fpn:
            rois, _, _ = generate_proposals_fpn(
                jax.tree.map(jax.lax.stop_gradient, rpn_out), level_anchors,
                im_info, int(cfg.TRAIN.RPN_PRE_NMS_TOP_N),
                int(cfg.TRAIN.RPN_POST_NMS_TOP_N),
                float(cfg.TRAIN.RPN_NMS_THRESH), float(cfg.TRAIN.RPN_MIN_SIZE),
                topk=str(cfg.TPU.get("FPN_TOPK", "exact")))
        else:
            fg_prob = jax.nn.softmax(rpn_cls, axis=-1)[..., 1]
            rois, _, _ = generate_proposals(
                jax.lax.stop_gradient(fg_prob.reshape(
                    rpn_cls.shape[0], rpn_cls.shape[1], -1)),
                jax.lax.stop_gradient(rpn_bbox),
                base_anchors, im_info, stride,
                int(cfg.TRAIN.RPN_PRE_NMS_TOP_N), int(cfg.TRAIN.RPN_POST_NMS_TOP_N),
                float(cfg.TRAIN.RPN_NMS_THRESH), float(cfg.TRAIN.RPN_MIN_SIZE))

        if stop_after == "proposals":
            # rois are stop-gradient by design; the 1e-30 term keeps the
            # proposal computation live in the forward pass
            tot = rpn_cls_loss + rpn_bbox_loss + 1e-30 * jnp.sum(rois)
            return tot, {"total_loss": tot}

        tgt = sample_rois(
            rois, jnp.ones(rois.shape[0], bool), gt_boxes, gt_valid, r_sample,
            batch_rois=batch_rois, num_reg_classes=num_reg,
            fg_fraction=float(cfg.TRAIN.FG_FRACTION),
            fg_thresh=float(cfg.TRAIN.FG_THRESH),
            bg_thresh_hi=float(cfg.TRAIN.BG_THRESH_HI),
            bg_thresh_lo=float(cfg.TRAIN.BG_THRESH_LO),
            bbox_normalize=bool(cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED),
            bbox_means=tuple(cfg.TRAIN.BBOX_MEANS),
            bbox_stds=tuple(cfg.TRAIN.BBOX_STDS),
            bbox_weights=tuple(np.asarray(cfg.TRAIN.BBOX_WEIGHTS).tolist()))

        if stop_after == "sample":
            tot = (rpn_cls_loss + rpn_bbox_loss +
                   1e-30 * (jnp.sum(tgt["rois"]) + jnp.sum(tgt["bbox_target"]) +
                            jnp.sum(tgt["label"].astype(jnp.float32))))
            return tot, {"total_loss": tot}

        if stop_after == "feat":
            # consume the head feature map WITHOUT pooling: forces the c5
            # trunk (the deformable res5 for DCN — otherwise DCE'd by the
            # earlier cuts, which only consume the RPN outputs) + conv_new_1
            tot = (rpn_cls_loss + rpn_bbox_loss +
                   1e-30 * jnp.sum(feat.astype(jnp.float32)))
            return tot, {"total_loss": tot}

        if stop_after == "pool":
            # ROI feature extraction only (deformable PSROI for DCN): the
            # head-FC/relation/learned-NMS stages are cut; grads still flow
            # through pooling into the trunk
            flat = model.apply({"params": params}, feat, tgt["rois"],
                               nongt_dim, pool_only=True,
                               method=type(model).head)
            tot = rpn_cls_loss + rpn_bbox_loss + 1e-30 * jnp.sum(flat)
            return tot, {"total_loss": tot}

        cls_score, bbox_pred, fc2 = model.apply(
            {"params": params}, feat, tgt["rois"], nongt_dim,
            method=type(model).head)

        rlabel, rweight = tgt["label"], tgt["bbox_weight"]
        if ohem:
            rlabel, rweight = ohem_select(cls_score, bbox_pred, rlabel,
                                          tgt["bbox_target"], rweight,
                                          int(cfg.TRAIN.BATCH_ROIS_OHEM))
        rcnn_cls_loss, rcnn_bbox_loss = rcnn_losses(
            cls_score, bbox_pred, rlabel, tgt["bbox_target"], rweight,
            bbox_norm_denom)

        total = rpn_cls_loss + rpn_bbox_loss + rcnn_cls_loss + rcnn_bbox_loss
        metrics = {
            "rpn_cls_loss": rpn_cls_loss, "rpn_bbox_loss": rpn_bbox_loss,
            "rcnn_cls_loss": rcnn_cls_loss, "rcnn_bbox_loss": rcnn_bbox_loss,
            "rpn_acc": accuracy_ignore(rpn_cls_flat, label),
            "rcnn_acc": accuracy_ignore(cls_score, rlabel),
        }

        if learn_nms and stop_after != "head":
            def lnms_branch(params, cls_s, bbox_p, rois, fc2_, im_info,
                            gt_boxes, gt_valid):
                probe = {"lnms_embed": "embed", "lnms_attn": "attn"}.get(
                    stop_after, "")
                ln = model.apply(
                    {"params": params}, cls_s, bbox_p, rois, fc2_, im_info,
                    probe=probe, method=type(model).learn_nms)
                if stop_after in ("lnms_embed", "lnms_attn", "lnms_score"):
                    # cut after embeddings / attention / the full logit fwd
                    # (before target matching / losses)
                    t = 1e-30 * (jnp.sum(ln["nms_multi_score"]) +
                                 jnp.sum(ln["sorted_bbox"]))
                    return t, (t, t, t, t)
                nt = nms_multi_target(
                    ln["sorted_bbox"], gt_boxes, gt_valid,
                    jax.lax.stop_gradient(ln["sorted_score"]), threshes)
                if stop_after == "lnms_target":
                    t = 1e-30 * (jnp.sum(ln["nms_multi_score"]) +
                                 jnp.sum(nt.astype(jnp.float32)))
                    return t, (t, t, t, t)
                nms_total, pos_l, neg_l = learn_nms_losses(
                    ln["nms_multi_score"], nt, float(cfg.TRAIN.nms_loss_scale),
                    float(cfg.TRAIN.nms_pos_scale))
                acc_pos, acc_neg = nms_accuracy(ln["nms_multi_score"], nt)
                return nms_total, (pos_l, neg_l, acc_pos, acc_neg)

            if bool(cfg.TPU.get("LNMS_REMAT", False)):
                # rematerialize the branch's forward during backward instead
                # of saving its residuals (A/B'd in context via
                # tools/microbench_train_cuts.py; see BASELINE.md round 4)
                lnms_branch = jax.checkpoint(lnms_branch)
            nms_total, (pos_l, neg_l, acc_pos, acc_neg) = lnms_branch(
                params, cls_score[:nongt_dim], bbox_pred[:nongt_dim],
                tgt["rois"][:nongt_dim], fc2[:nongt_dim], im_info,
                gt_boxes, gt_valid)
            total = total + nms_total
            metrics.update({"nms_pos_loss": pos_l, "nms_neg_loss": neg_l,
                            "nms_acc_pos": acc_pos, "nms_acc_neg": acc_neg})

        metrics["total_loss"] = total
        return total, metrics

    def train_step(state: TrainState, batch):
        """batch: dict(image [B,H,W,3] or s2d [B,12,H/2,W/2] (f32 or uint8),
        im_info [B,3], gt_boxes [B,G,5], gt_valid [B,G])."""
        step_rng = jax.random.fold_in(state.rng, state.step)
        B = batch["image"].shape[0]
        rngs = jax.random.split(step_rng, B)

        def loss_fn(params):
            # reference grad_req='null' (core/module.py:753-773): frozen
            # params are excluded from differentiation ENTIRELY, so XLA DCEs
            # their weight-grad convs and every backward chain with no live
            # trainable consumer below it. The optimizer's set_to_zero mask
            # alone still paid the full backward first (and, with GRAD_CLIP,
            # let frozen grads pollute the global norm). Numerics of the
            # update are unchanged: these grads were already masked to zero.
            mask = trainable_mask(params, fixed_prefixes)
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p),
                params, mask)
            # uint8 loader batches (TPU.H2D_UINT8): exact on-device mean-sub
            # + pad-zeroing; no-op for f32 (dtype is static under jit)
            from relation_tpu.core.predictor import _image_from_u8
            images = jax.vmap(
                lambda im, ii: _image_from_u8(im, ii, pixel_means))(
                    batch["image"], batch["im_info"])
            # conv trunk runs natively batched (one conv program over B, the
            # XLA form vmap would produce anyway — but the Pallas stem's B==1
            # dispatch stays correct: un-vmapped kernel at B=1, XLA tap-slice
            # path at B>1 instead of vmap's pallas batching, which VMEM-OOMs)
            method = (RelationRCNNFPN.features_and_rpn if is_fpn
                      else RelationRCNN.features_and_rpn)
            fr = model.apply({"params": params}, images, method=method)
            feat, rpn = (fr[0], fr[1]) if is_fpn else (fr[0], (fr[1], fr[2]))
            totals, metrics = jax.vmap(
                per_image, in_axes=(None, 0, 0, 0, 0, 0, 0))(
                    params, feat, rpn, batch["im_info"], batch["gt_boxes"],
                    batch["gt_valid"], rngs)
            return jnp.mean(totals), jax.tree.map(jnp.mean, metrics)

        if no_grad:
            _, metrics = loss_fn(state.params)
            return state.replace(step=state.step + 1), metrics
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), metrics

    return train_step


def create_train_state(model: RelationRCNN, cfg, rng: jax.Array,
                       sample_image, sample_im_info,
                       epoch_size: int = 1000,
                       fixed_prefixes=None) -> TrainState:
    """``fixed_prefixes`` overrides cfg.network.FIXED_PARAMS for the optimizer
    freeze mask (the alternate workflow's train_shared stage passes
    FIXED_PARAMS_SHARED, reference function/train_rcnn.py:119-123)."""
    # Param shapes are independent of the ROI count; init with a small set that is
    # still >= first_n so the learned-NMS trace is well-formed.
    n_init = max(int(model.first_n) + 1, 8)
    sample_rois_arr = jnp.tile(jnp.asarray([[0.0, 0.0, 32.0, 32.0]]), (n_init, 1))
    # jit the flax init: eager init dispatches ~600 ops one by one, which costs
    # ~5 MINUTES through this environment's async device tunnel (~25 ms/fetch
    # round trip); one compiled program brings it to ~30 s compile + ms run
    variables = jax.jit(model.init, static_argnums=(4,))(
        rng, sample_image, sample_rois_arr, sample_im_info, n_init)
    params = variables["params"]
    if fixed_prefixes is None:
        fixed_prefixes = cfg.network.FIXED_PARAMS
    mask = trainable_mask(params, fixed_prefixes)
    tx = make_optimizer(cfg, epoch_size, mask)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), rng=rng, tx=tx)


def refreeze_state(state: TrainState, cfg, fixed_prefixes,
                   epoch_size: int = 1000) -> TrainState:
    """Fresh optimizer over the SAME params with a new freeze mask — the
    per-stage optimizer re-init of the alternate workflow (each reference
    stage calls module.fit with its own optimizer + fixed_param_prefix,
    function/train_rcnn.py:119-136). Momentum restarts at zero, exactly like
    the reference's new Module per stage."""
    mask = trainable_mask(state.params, fixed_prefixes)
    tx = make_optimizer(cfg, epoch_size, mask)
    return state.replace(opt_state=tx.init(state.params), tx=tx)
