"""SAM3 video segmentation — text-prompted detection + memory tracking.

Reference entry: preprocessing/sam3/preprocessor.py:285-406
run_sam3_video (per keyword: `add_prompt` on frame 0 → grounding
detection seeds tracked objects; `propagate_in_video` streams per-frame
masks; outputs are unioned into one binary mask video) and the
propagation loop of model/sam3_video_inference.py /
sam3_tracking_predictor.py.

TPU-native structure: three jitted step functions with static shapes —
backbone (ViT+FPN per frame), conditioning step (frame 0: input masks
become outputs + first memory, sam3_tracker_base.py:388-435), and
track step (memory-conditioned SAM heads + new memory,
sam3_tracker_base.py:929-1066).  The host loop only selects which past
frames fill the fixed memory slots (cond frame + last num_maskmem-1
frames at stride r, sam3_tracker_base.py:591-650) and which object
pointers enter cross-attention (up to max_obj_ptrs).

Note: the reference's multiplex tracker also re-detects on later frames
and Hungarian-matches new detections to live tracklets
(model/sam3_multiplex_tracking.py); this implementation seeds objects
from frame-0 grounding only, which matches the mask-creation workflow
the preprocessor drives (one add_prompt at frame 0).
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .model import Sam3Config, sam3_detect
from .neck import neck_forward
from .vit import vit_forward
from .tracker import (TrackerConfig, init_tracker, forward_sam_heads,
                      use_mask_as_output, condition_features,
                      encode_memory, _conv)


def _nearest(img, h, w):
    yi = (np.arange(h) * img.shape[0] / h).astype(np.int64)
    xi = (np.arange(w) * img.shape[1] / w).astype(np.int64)
    return img[yi][:, xi]


class Sam3VideoPredictor:
    """Keyword → per-frame binary masks over a video.

    params: image-model params (init_sam3); the ViT/FPN backbone is
    shared with the tracker (model_builder.py build_tracker
    with_backbone → same SAM3VLBackbone).  tracker_params: init_tracker
    output (random init in this environment — no checkpoints).
    """

    def __init__(self, params, cfg: Sam3Config, tracker_params=None,
                 tracker_cfg: Optional[TrackerConfig] = None,
                 tokenizer=None, threshold: float = 0.5,
                 max_objects: int = 4, attn_backend: str = "auto"):
        self.params = params
        self.cfg = cfg
        if tracker_cfg is None:
            tracker_cfg = TrackerConfig(
                d_model=cfg.d_model, image_size=cfg.img_size,
                backbone_stride=cfg.vit.patch_size,
                num_maskmem=3 if cfg.img_size <= 256 else 7,
                mem_dim=max(cfg.d_model // 4, 8),
                max_obj_ptrs=4 if cfg.img_size <= 256 else 16,
                mem_layers=2 if cfg.img_size <= 256 else 4,
                mem_ffn=2 * cfg.d_model,
                mask_in_chans=max(cfg.d_model // 2, 8),
                twoway_heads=cfg.num_heads,
                twoway_mlp=2 * cfg.d_model)
        self.tcfg = tracker_cfg
        if tracker_params is None:
            tracker_params = init_tracker(jax.random.PRNGKey(7),
                                          tracker_cfg)
        self.tparams = tracker_params
        self.threshold = threshold
        self.max_objects = max_objects
        self.attn_backend = attn_backend
        if tokenizer is None:
            from ...utils.tokenizer import load_tokenizer
            tokenizer = load_tokenizer(None)
        self.tokenizer = tokenizer

        self._backbone_jit = jax.jit(self._backbone)
        self._cond_jit = jax.jit(self._cond_step)
        self._track_jit = jax.jit(self._track_step)
        self._detect_jit = jax.jit(
            lambda p, img, ids: sam3_detect(p, cfg, img, ids,
                                            attn_backend=attn_backend))

    # -- jitted pieces ----------------------------------------------------

    def _backbone(self, image):
        """image [1,S,S,3] in [0,1] -> (f72, pos72, s0, s1)."""
        x = (image.astype(self.cfg.compute_dtype) - 0.5) / 0.5
        feats = vit_forward(self.params["vit"], self.cfg.vit, x,
                            backend="xla")
        levels, poss = neck_forward(self.params["neck"], feats,
                                    self.cfg.d_model)
        f288, f144, f72 = levels[0], levels[1], levels[2]
        dec = self.tparams["decoder"]
        s0 = _conv(f288, dec["conv_s0"])       # [1,4e,4e,d/8]
        s1 = _conv(f144, dec["conv_s1"])       # [1,2e,2e,d/4]
        return f72, poss[2], s0, s1

    def _cond_step(self, f72, pos72, s0, s1, mask_input):
        """mask_input [N,S,S,1] binary at image res -> outputs + memory."""
        n = mask_input.shape[0]
        f72n = jnp.broadcast_to(f72, (n,) + f72.shape[1:])
        hi = (jnp.broadcast_to(s0, (n,) + s0.shape[1:]),
              jnp.broadcast_to(s1, (n,) + s1.shape[1:]))
        # init cond frame skips memory attention: feat + no_mem_embed
        # (sam3_tracker_base.py:768-772)
        feat = f72n + self.tparams["no_mem_embed"]
        out = use_mask_as_output(self.tparams, self.tcfg, feat, hi,
                                 mask_input)
        mem = encode_memory(
            self.tparams["memenc"], self.tcfg, f72n,
            out["high_res"].transpose(0, 2, 3, 1),
            out["obj_logits"], self.tparams["no_obj_spatial"],
            binarize=False)
        return out, mem

    def _track_step(self, f72, pos72, s0, s1, spatial_mem, tpos_idx,
                    slot_valid, obj_ptrs, ptr_rel_t, ptr_valid):
        n = spatial_mem.shape[0]
        f72n = jnp.broadcast_to(f72, (n,) + f72.shape[1:])
        hi = (jnp.broadcast_to(s0, (n,) + s0.shape[1:]),
              jnp.broadcast_to(s1, (n,) + s1.shape[1:]))
        feat = condition_features(
            self.tparams, self.tcfg, f72n, pos72, spatial_mem, tpos_idx,
            slot_valid, obj_ptrs, ptr_rel_t, ptr_valid)
        # no points during propagation -> multimask w/ best-IoU pick
        # (_use_multimask: multimask_min_pt_num=0, sam3_tracker_base)
        out = forward_sam_heads(self.tparams, self.tcfg, feat, hi,
                                multimask=True)
        mem = encode_memory(
            self.tparams["memenc"], self.tcfg, f72n,
            out["high_res"].transpose(0, 2, 3, 1),
            out["obj_logits"], self.tparams["no_obj_spatial"],
            binarize=False)
        return out, mem

    # -- host loop --------------------------------------------------------

    def _detect_frame0(self, frame, text):
        """frame [S,S,3] float [0,1] -> [N,S,S] bool masks."""
        ids = None
        if text is not None:
            tok, _ = self.tokenizer([text], self.cfg.text.context_length)
            ids = jnp.asarray(tok, jnp.int32)
        out = self._detect_jit(self.params, jnp.asarray(frame)[None], ids)
        scores = jax.nn.sigmoid(np.asarray(out["scores"][0]))
        presence = float(jax.nn.sigmoid(np.asarray(out["presence"][0])))
        conf = scores * presence
        order = np.argsort(-conf)[:self.max_objects]
        keep = order[conf[order] >= self.threshold]
        if keep.size == 0:
            keep = order[:1]
        masks = np.asarray(out["masks"][0])[keep] > 0.0    # [N,h4,w4]
        size = self.cfg.img_size
        up = np.stack([_nearest(m, size, size) for m in masks])
        return up, conf[keep]

    def segment_video(self, video: np.ndarray, text: str = None,
                      frame0_masks: Optional[np.ndarray] = None,
                      progress_callback=None):
        """video [T,H,W,3] uint8/float → dict with masks [T,N,H,W] bool
        and scores [N]."""
        t_total, h0, w0 = video.shape[:3]
        size = self.cfg.img_size
        vid = np.asarray(video, np.float32)
        if vid.max() > 1.5:
            vid = vid / 255.0

        frames = np.stack([_nearest(f, size, size) for f in vid])
        if frame0_masks is None:
            masks0, scores = self._detect_frame0(frames[0], text)
        else:
            masks0 = np.stack([_nearest(m.astype(np.float32), size, size)
                               for m in frame0_masks]) > 0.5
            scores = np.ones((masks0.shape[0],), np.float32)
        n = masks0.shape[0]
        tcfg = self.tcfg
        s_slots = tcfg.num_maskmem
        p_slots = tcfg.max_obj_ptrs
        hw = tcfg.embed_size ** 2

        # memory bank: frame_idx -> (mem [N,HW,md], obj_ptr [N,d])
        mems: Dict[int, jnp.ndarray] = {}
        ptrs: Dict[int, jnp.ndarray] = {}
        out_masks = np.zeros((t_total, n, h0, w0), bool)

        bb = self._backbone_jit(jnp.asarray(frames[0])[None])
        cond_out, cond_mem = self._cond_jit(
            *bb, jnp.asarray(masks0, jnp.float32)[..., None])
        mems[0], ptrs[0] = cond_mem, cond_out["obj_ptr"]
        hi0 = np.asarray(cond_out["high_res"])[:, 0] > 0
        out_masks[0] = np.stack([_nearest(m, h0, w0) for m in hi0])
        if progress_callback is not None:
            progress_callback(1, t_total)

        r = tcfg.memory_stride
        zero_mem = jnp.zeros((n, hw, tcfg.mem_dim), jnp.float32)
        zero_ptr = jnp.zeros((n, tcfg.d_model), jnp.float32)
        for t in range(1, t_total):
            # slot 0: cond frame (t_pos 0 -> tpos idx num_maskmem-1);
            # slots 1..: previous frames, nearest first = t_pos
            # num_maskmem-1 (sam3_tracker_base.py:616-650, r stride)
            sel: List[int] = [0]
            tpos_idx = [s_slots - 1]
            valid = [True]
            prev_list = []
            for t_pos in range(1, s_slots):
                t_rel = s_slots - t_pos
                if t_rel == 1:
                    prev = t - 1
                else:
                    prev = ((t - 2) // r) * r - (t_rel - 2) * r
                ok = 0 < prev < t and prev in mems
                prev_list.append((t_pos, prev, ok))
            for t_pos, prev, ok in prev_list:
                sel.append(prev if ok else 0)
                tpos_idx.append(s_slots - 1 - t_pos)
                valid.append(ok)
            mem_stack = jnp.stack(
                [mems[f] if ok else zero_mem
                 for f, ok in zip(sel, valid)], axis=1)
            slot_valid = jnp.asarray(valid, bool)[None].repeat(n, 0)

            # object pointers: cond + previous frames (max_obj_ptrs)
            psel = [(t, 0)] + [(dt, t - dt) for dt in range(1, p_slots)
                               if t - dt > 0 and (t - dt) in ptrs]
            psel = psel[:p_slots]
            ptr_stack, rel, pval = [], [], []
            for dt, f in psel:
                ptr_stack.append(ptrs[f])
                rel.append(float(dt))
                pval.append(True)
            while len(ptr_stack) < p_slots:
                ptr_stack.append(zero_ptr)
                rel.append(0.0)
                pval.append(False)
            ptr_stack = jnp.stack(ptr_stack, axis=1)      # [N,P,d]
            rel = jnp.asarray(rel, jnp.float32)[None].repeat(n, 0)
            pval = jnp.asarray(pval, bool)[None].repeat(n, 0)

            bb = self._backbone_jit(jnp.asarray(frames[t])[None])
            out, mem = self._track_jit(
                *bb, mem_stack, jnp.asarray(tpos_idx, jnp.int32),
                slot_valid, ptr_stack, rel, pval)
            mems[t], ptrs[t] = mem, out["obj_ptr"]
            hi = np.asarray(out["high_res"])[:, 0] > 0
            out_masks[t] = np.stack([_nearest(m, h0, w0) for m in hi])
            # trim memories beyond the reachable window
            old = t - r * s_slots
            if old > 0 and old in mems:
                del mems[old]
            if progress_callback is not None:
                progress_callback(t + 1, t_total)
        return {"masks": out_masks.transpose(1, 0, 2, 3),  # [N,T,H,W]
                "scores": scores}


def run_sam3_video(video: np.ndarray, keywords, predictor:
                   Sam3VideoPredictor, colorize_objects: bool = False,
                   progress_callback=None) -> np.ndarray:
    """Reference contract (preprocessor.py:285-406): per keyword, seed
    objects by grounding on frame 0 then propagate; union everything
    into [T,H,W] bool (or a [T,H,W,3] instance-colour video)."""
    keywords = [str(k).strip() for k in keywords if str(k).strip()]
    t, h, w = video.shape[:3]
    if not keywords:
        return (np.zeros((t, h, w, 3), np.uint8) if colorize_objects
                else np.zeros((t, h, w), bool))
    palette = np.asarray(
        [[255, 99, 71], [65, 105, 225], [60, 179, 113], [255, 215, 0],
         [186, 85, 211], [255, 140, 0], [70, 130, 180], [205, 92, 92]],
        np.uint8)
    if colorize_objects:
        out = np.zeros((t, h, w, 3), np.uint8)
    else:
        out = np.zeros((t, h, w), bool)
    obj_i = 0
    total = len(keywords) * t

    for ki, kw in enumerate(keywords):
        cb = None
        if progress_callback is not None:
            cb = lambda done, tot: progress_callback(
                min(ki * t + done, total), total)
        res = predictor.segment_video(video, text=kw,
                                      progress_callback=cb)
        for m in res["masks"]:                     # [T,H,W] per object
            if colorize_objects:
                out[m] = palette[obj_i % len(palette)]
                obj_i += 1
            else:
                out |= m
    return out
