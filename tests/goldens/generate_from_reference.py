"""Golden-tensor generator that executes the REFERENCE'S OWN code.

Unlike generate.py (re-derived formulas — a transcription error there
would self-confirm), this runs the actual modules under /root/reference
with minimal import shims for packages absent in this env (diffusers,
mmgp, imageio, soundfile, torchvision, skimage) and records goldens:

  unipc_ref_trace.npz  — shared/utils/fm_solvers_unipc.py
                         FlowUniPCMultistepScheduler, orders 2 and 3,
                         sigma tables + 8-step trajectories
  dpm_ref_trace.npz    — shared/utils/fm_solvers.py
                         FlowDPMSolverMultistepScheduler + the
                         get_sampling_sigmas/retrieve_timesteps path
  flowmatch_ref_trace.npz — shared/utils/basic_flowmatch.py
                         FlowMatchScheduler (CausVid fixed table)
  wan_block_ref.npz    — models/wan/modules/model.py WanAttentionBlock
                         (t2v_cross_attn, qk_norm, cross_attn_norm) with
                         the model's own rope_params freqs

The shims implement only import-surface plumbing (config capture, a
torch-SDPA pay_attention with the same qkv_list calling convention) —
every numerical formula executed comes from the reference files.

Run: python tests/goldens/generate_from_reference.py
"""
import inspect
import os
import sys
import types
from types import SimpleNamespace

import numpy as np
import torch

HERE = os.path.dirname(os.path.abspath(__file__))
REF = os.environ.get("WAN2GP_REFERENCE", "/root/reference")


def save(name, **arrs):
    np.savez(os.path.join(HERE, name),
             **{k: np.asarray(v) for k, v in arrs.items()})
    print(f"wrote {name}: {sorted(arrs)}")


# ---------------------------------------------------------------------------
# import shims
# ---------------------------------------------------------------------------

def _module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_shims():
    # ---- diffusers (config capture + scheduler base plumbing only)
    class ConfigMixin:
        config_name = "scheduler_config.json"

        def register_to_config(self, **kwargs):
            cfg = dict(getattr(self, "_cfg_dict", {}))
            cfg.update(kwargs)
            self._cfg_dict = cfg
            self.config = SimpleNamespace(**cfg)

    def register_to_config(init):
        sig = inspect.signature(init)

        def wrapper(self, *args, **kwargs):
            ba = sig.bind(self, *args, **kwargs)
            ba.apply_defaults()
            cfg = {k: v for k, v in ba.arguments.items()
                   if k not in ("self", "args", "kwargs")}
            self._cfg_dict = cfg
            self.config = SimpleNamespace(**cfg)
            init(self, *args, **kwargs)
        return wrapper

    class SchedulerMixin:
        pass

    class SchedulerOutput:
        def __init__(self, prev_sample):
            self.prev_sample = prev_sample

    import enum

    class KarrasDiffusionSchedulers(enum.Enum):
        """Empty stand-in for the diffusers enum (only iterated for the
        _compatibles registry)."""

    def deprecate(*a, **k):
        return None

    def randn_tensor(shape, generator=None, device=None, dtype=None):
        return torch.randn(shape, generator=generator, dtype=dtype)

    _module("diffusers")
    _module("diffusers.configuration_utils", ConfigMixin=ConfigMixin,
            register_to_config=register_to_config)
    _module("diffusers.schedulers")
    _module("diffusers.schedulers.scheduling_utils",
            SchedulerMixin=SchedulerMixin, SchedulerOutput=SchedulerOutput,
            KarrasDiffusionSchedulers=KarrasDiffusionSchedulers)
    _module("diffusers.utils", deprecate=deprecate,
            is_scipy_available=lambda: False)
    _module("diffusers.utils.torch_utils", randn_tensor=randn_tensor)
    sys.modules["diffusers"].ModelMixin = torch.nn.Module
    _module("diffusers.models", ModelMixin=torch.nn.Module)
    _module("diffusers.models.modeling_utils", ModelMixin=torch.nn.Module)

    # ---- mmgp (shared_state bus + named caches)
    _caches = {}
    offload = _module("mmgp.offload", shared_state={},
                      get_cache=lambda name: _caches.setdefault(name, {}),
                      clear_caches=_caches.clear)
    _module("mmgp", offload=offload)

    # ---- shared.attention: pay_attention with the reference calling
    # convention (consumes-and-clears qkv_list of [B, L, N, D]) on torch
    # SDPA — the kernels themselves are CUDA-only
    def pay_attention(qkv_list, *a, **k):
        q, kk, v = qkv_list[0], qkv_list[1], qkv_list[2]
        qkv_list.clear()
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), kk.transpose(1, 2), v.transpose(1, 2))
        return o.transpose(1, 2)

    shared_pkg = _module("shared")
    shared_pkg.__path__ = [os.path.join(REF, "shared")]
    _module("shared.attention", pay_attention=pay_attention)

    # ---- tiny stubs for media libs pulled in at module level
    for name in ("imageio", "soundfile", "torchvision", "skimage"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                _module(name)
    if not hasattr(sys.modules.get("skimage"), "color"):
        sys.modules["skimage"].color = _module("skimage.color")

    # ---- synthetic package roots so models/wan/modules/model.py imports
    # WITHOUT executing the real models/wan/__init__.py (which pulls the
    # whole app)
    refmodels = _module("refmodels")
    refmodels.__path__ = [os.path.join(REF, "models")]
    wan = _module("refmodels.wan")
    wan.__path__ = [os.path.join(REF, "models", "wan")]
    mods = _module("refmodels.wan.modules")
    mods.__path__ = [os.path.join(REF, "models", "wan", "modules")]

    # sibling feature modules imported at model.py top level but NOT
    # exercised by the block golden (their own deps — torchvision.models,
    # skimage pipelines — are absent here); posemb_layers stays real
    def _noop(*a, **k):
        raise NotImplementedError("stubbed sibling — not used by golden")

    _module("refmodels.wan.multitalk")
    _module("refmodels.wan.multitalk.multitalk_utils",
            get_attn_map_with_target=_noop)
    _module("refmodels.wan.animate")
    _module("refmodels.wan.animate.motion_encoder", Generator=_noop)
    _module("refmodels.wan.animate.face_blocks", FaceAdapter=_noop,
            FaceEncoder=_noop)
    _module("refmodels.wan.animate.model_animate",
            after_patch_embedding=_noop)
    _module("refmodels.wan.scail")
    _module("refmodels.wan.scail.model_scail",
            build_scail_pose_tokens=_noop)
    _module("refmodels.wan.scail2", build_scail2_pose_tokens=_noop)
    _module("refmodels.wan.steadydancer")
    _module("refmodels.wan.steadydancer.small_archs", FactorConv3d=_noop,
            PoseRefNetNoBNV3=_noop)
    _module("refmodels.wan.steadydancer.mobilenetv2_dcd", DYModule=_noop)
    _module("refmodels.wan.shotplan", inject_shotplan_tokens=_noop)

    # ---- hyvideo vae15 import surface (AutoencoderKLConv3D)
    class _BaseOutput:
        def __init__(self, **kw):
            for k, v in kw.items():
                setattr(self, k, v)

    class _DiagGauss:
        def __init__(self, parameters):
            self.parameters = parameters
            self.mean, self.logvar = torch.chunk(parameters, 2, dim=1)

        def mode(self):
            return self.mean

    _module("diffusers.models.autoencoders")
    _module("diffusers.models.autoencoders.vae", BaseOutput=_BaseOutput,
            DiagonalGaussianDistribution=_DiagGauss)
    _module("diffusers.models.modeling_outputs",
            AutoencoderKLOutput=_BaseOutput)
    if "loguru" not in sys.modules:
        try:
            __import__("loguru")
        except ImportError:
            class _Logger:
                def __getattr__(self, name):
                    return lambda *a, **k: None
            _module("loguru", logger=_Logger())
    hyv = _module("refmodels.hyvideo")
    hyv.__path__ = [os.path.join(REF, "models", "hyvideo")]
    hvv = _module("refmodels.hyvideo.vae")
    hvv.__path__ = [os.path.join(REF, "models", "hyvideo", "vae")]


# ---------------------------------------------------------------------------
# solvers — the reference's own scheduler classes
# ---------------------------------------------------------------------------

def _velocity(x, t):
    """Deterministic fake velocity model shared by all solver traces."""
    return 0.3 * x * torch.cos(torch.as_tensor(float(t)) / 250.0) - 0.1


def gen_unipc_ref():
    import importlib
    m = importlib.import_module("shared.utils.fm_solvers_unipc")
    rng = np.random.default_rng(11)
    x0 = torch.tensor(rng.standard_normal((1, 4, 2, 2)), dtype=torch.float32)
    out = {"x0": x0.numpy()}
    for order in (2, 3):
        # production construction (any2video.py:518-521): shift=1 at
        # init, the real shift applied by set_timesteps
        sch = m.FlowUniPCMultistepScheduler(
            num_train_timesteps=1000, solver_order=order, shift=1,
            use_dynamic_shifting=False)
        sch.set_timesteps(8, shift=5.0)
        out[f"sigmas_o{order}"] = sch.sigmas.numpy()
        out[f"timesteps_o{order}"] = sch.timesteps.numpy()
        x = x0.clone()
        traj = []
        for t in sch.timesteps:
            v = _velocity(x, t)
            x = sch.step(v, t, x, return_dict=False)[0]
            traj.append(x.numpy().copy())
        out[f"traj_o{order}"] = np.stack(traj)
    save("unipc_ref_trace.npz", **out)


def gen_dpm_ref():
    import importlib
    m = importlib.import_module("shared.utils.fm_solvers")
    rng = np.random.default_rng(12)
    x0 = torch.tensor(rng.standard_normal((1, 4, 2, 2)), dtype=torch.float32)
    # production construction (any2video.py:523-527): shift=1 at init,
    # the sampling sigmas carry the real shift
    sch = m.FlowDPMSolverMultistepScheduler(
        num_train_timesteps=1000, solver_order=2, shift=1,
        use_dynamic_shifting=False)
    sampling_sigmas = m.get_sampling_sigmas(8, 5.0)
    timesteps, _ = m.retrieve_timesteps(sch, device="cpu",
                                        sigmas=sampling_sigmas)
    x = x0.clone()
    traj = []
    for t in timesteps:
        v = _velocity(x, t)
        x = sch.step(v, t, x, return_dict=False)[0]
        traj.append(x.numpy().copy())
    save("dpm_ref_trace.npz", x0=x0.numpy(),
         sampling_sigmas=np.asarray(sampling_sigmas),
         timesteps=timesteps.numpy(), traj=np.stack(traj))


def gen_flowmatch_ref():
    import importlib
    m = importlib.import_module("shared.utils.basic_flowmatch")
    rng = np.random.default_rng(13)
    x0 = torch.tensor(rng.standard_normal((1, 4, 2, 2)), dtype=torch.float32)
    # the production CausVid setup (any2video.py:512-517): FlowMatch
    # scheduler with the fixed timestep table overriding set_timesteps
    sch = m.FlowMatchScheduler(num_inference_steps=9, shift=8.0,
                               sigma_min=0.0, extra_one_step=True)
    sch.timesteps = torch.tensor([1000, 934, 862, 756, 603, 410, 250,
                                  140, 74])
    sch.sigmas = torch.cat([sch.timesteps / 1000, torch.tensor([0.0])])
    x = x0.clone()
    traj = []
    for t in sch.timesteps:
        v = _velocity(x, t)
        x = sch.step(v, t, x)[0]          # step returns [prev_sample]
        traj.append(x.numpy().copy())
    save("flowmatch_ref_trace.npz", x0=x0.numpy(),
         timesteps=sch.timesteps.numpy(), sigmas=sch.sigmas.numpy(),
         traj=np.stack(traj))


# ---------------------------------------------------------------------------
# WanAttentionBlock — the reference's own block class
# ---------------------------------------------------------------------------

def gen_wan_block_ref():
    import importlib
    model = importlib.import_module("refmodels.wan.modules.model")

    dim, n_heads, ffn_dim, text_len = 32, 2, 64, 4
    f, h, w = 2, 2, 2
    seq = f * h * w
    hd = dim // n_heads
    torch.manual_seed(21)

    blk = model.WanAttentionBlock("t2v_cross_attn", dim, ffn_dim, n_heads,
                                  qk_norm=True, cross_attn_norm=True,
                                  eps=1e-6)
    # float64, NOT float32: WanRMSNorm.forward does `y = x.float()` then
    # `y.pow_(2)` in place (model.py:159-173) — with fp32 inputs .float()
    # is a no-copy alias and the squaring corrupts x.  The reference only
    # runs this module in bf16/fp16 (where .float() copies); float64
    # restores the copy while keeping golden-grade precision.
    blk = blk.double().eval()
    # the app calls adapt_modulation() post-load, wrapping the parameter
    # in a module with .weight (model.py:1280-1292); replicate it
    mod_param = blk.modulation
    holder = torch.nn.Module()
    holder.weight = mod_param
    del blk.modulation
    blk.modulation = holder

    rng = np.random.default_rng(22)
    x = torch.tensor(rng.standard_normal((1, seq, dim)), dtype=torch.float64)
    e = torch.tensor(rng.standard_normal((1, 6, dim)) * 0.5,
                     dtype=torch.float64)
    ctx = torch.tensor(rng.standard_normal((1, text_len, dim)),
                       dtype=torch.float64)

    # the model's own rope tables (posemb_layers get_nd_rotary_pos_embed,
    # the path WanModel.forward uses via get_rotary_pos_embed) at the
    # wan per-axis split d-4(d//6) / 2(d//6) / 2(d//6)
    posemb = importlib.import_module("refmodels.wan.modules.posemb_layers")
    rope_dims = [hd - 4 * (hd // 6), 2 * (hd // 6), 2 * (hd // 6)]
    cos, sin = posemb.get_nd_rotary_pos_embed(
        [f, h, w], rope_dim_list=rope_dims, head_dim=hd, use_real=True)
    freqs = (cos, sin)

    with torch.no_grad():
        out = blk(x.clone(), e, torch.tensor([f, h, w]), freqs, ctx)

    f32 = lambda t: t.numpy().astype(np.float32)
    sd = {k: f32(v) for k, v in blk.state_dict().items()}
    save("wan_block_ref.npz", x=f32(x), e=f32(e), ctx=f32(ctx),
         out=f32(out), grid=np.array([f, h, w]),
         rope_cos=cos.numpy().astype(np.float32),
         rope_sin=sin.numpy().astype(np.float32),
         dims=np.array([dim, n_heads, ffn_dim]),
         **{k.replace(".", "__"): v for k, v in sd.items()})


def gen_hv15_vae_ref():
    """Executes the reference's AutoencoderKLConv3D encoder+decoder
    (models/hyvideo/vae/hunyuanvideo_15_vae.py) at tiny dims.  This is
    the oracle the loader-roundtrip test cannot be: the r05
    decoder-channel-order bug (decoder must iterate block_out_channels
    REVERSED, :562) self-confirmed through every structure-derived
    test."""
    import importlib
    m = importlib.import_module("refmodels.hyvideo.vae.hunyuanvideo_15_vae")

    torch.manual_seed(31)
    vae = m.AutoencoderKLConv3D(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16, 32), layers_per_block=1,
        ffactor_spatial=4, ffactor_temporal=2,
        sample_size=32, sample_tsize=4).double().eval()

    rng = np.random.default_rng(32)
    x = torch.tensor(rng.standard_normal((1, 3, 5, 16, 16)) * 0.5,
                     dtype=torch.float64)
    z = torch.tensor(rng.standard_normal((1, 4, 3, 4, 4)) * 0.5,
                     dtype=torch.float64)
    with torch.no_grad():
        moments = vae.encoder(x)            # [1, 2z, T', H', W']
        dec = vae.decoder(z)                # [1, 3, T, H, W]

    f32 = lambda t: t.numpy().astype(np.float32)
    sd = {k: f32(v) for k, v in vae.state_dict().items()}
    save("hv15_vae_ref.npz", x=f32(x), z=f32(z),
         enc_mean=f32(moments[:, :4]), dec=f32(dec),
         **{k.replace(".", "__"): v for k, v in sd.items()})


def gen_flux_blocks_ref():
    """Executes the reference's Flux DoubleStreamBlock/SingleStreamBlock
    (models/flux/modules/layers.py:198/:315) with the reference's own
    EmbedND rope, float64."""
    import importlib
    flux_pkg = _module("refmodels.flux")
    flux_pkg.__path__ = [os.path.join(REF, "models", "flux")]
    mods = _module("refmodels.flux.modules")
    mods.__path__ = [os.path.join(REF, "models", "flux", "modules")]
    layers = importlib.import_module("refmodels.flux.modules.layers")

    def presplit(parent, attr, mapped, sizes, dim_in):
        # the app splits fused linears post-load (layers.py
        # get_linear_split_map via mmgp); the forwards reference the
        # split attrs unconditionally, so replicate that here
        fused = getattr(parent, attr)
        off = 0
        for name, sz in zip(mapped, sizes):
            lin = torch.nn.Linear(dim_in, sz,
                                  bias=fused.bias is not None).double()
            with torch.no_grad():
                lin.weight.copy_(fused.weight[off:off + sz])
                if fused.bias is not None:
                    lin.bias.copy_(fused.bias[off:off + sz])
            setattr(parent, name, lin)
            off += sz

    torch.manual_seed(41)
    h, n, mlp_ratio = 32, 2, 4.0
    axes_dim = (4, 6, 6)
    li, lt = 12, 4
    dbl = layers.DoubleStreamBlock(h, n, mlp_ratio,
                                   qkv_bias=True).double().eval()
    sgl = layers.SingleStreamBlock(h, n, mlp_ratio).double().eval()
    presplit(dbl.img_attn, "qkv", ["q", "k", "v"], [h, h, h], h)
    presplit(dbl.txt_attn, "qkv", ["q", "k", "v"], [h, h, h], h)
    presplit(sgl, "linear1",
             ["linear1_attn_q", "linear1_attn_k", "linear1_attn_v",
              "linear1_mlp"], [h, h, h, int(h * mlp_ratio)], h)
    emb = layers.EmbedND(dim=h // n, theta=10_000,
                         axes_dim=list(axes_dim)).double()

    rng = np.random.default_rng(42)
    img = torch.tensor(rng.standard_normal((1, li, h)), dtype=torch.float64)
    txt = torch.tensor(rng.standard_normal((1, lt, h)), dtype=torch.float64)
    vec = torch.tensor(rng.standard_normal((1, h)) * 0.5,
                       dtype=torch.float64)
    x = torch.tensor(rng.standard_normal((1, lt + li, h)),
                     dtype=torch.float64)
    ids = np.zeros((lt + li, 3), np.float64)
    ids[lt:, 1] = np.arange(li) // 4
    ids[lt:, 2] = np.arange(li) % 4
    ids_t = torch.tensor(ids[None], dtype=torch.float64)

    with torch.no_grad():
        pe = emb(ids_t)
        out_img, out_txt = dbl(img.clone(), txt.clone(), vec, pe)
        out_sgl = sgl(x.clone(), vec, pe)

    f32 = lambda t: t.numpy().astype(np.float32)
    save("flux_blocks_ref.npz", img=f32(img), txt=f32(txt), vec=f32(vec),
         x=f32(x), ids=ids.astype(np.float32),
         out_img=f32(out_img), out_txt=f32(out_txt), out_sgl=f32(out_sgl),
         dims=np.array([h, n, int(h * mlp_ratio)]),
         axes_dim=np.array(axes_dim),
         **{"dbl__" + k.replace(".", "__"): f32(v)
            for k, v in dbl.state_dict().items()},
         **{"sgl__" + k.replace(".", "__"): f32(v)
            for k, v in sgl.state_dict().items()})


def gen_hyvideo_block_ref():
    """Executes the reference's MMDoubleStreamBlock
    (models/hyvideo/modules/models.py:34) with the model's own
    get_nd_rotary_pos_embed freqs (hunyuan.py:716: theta 256).
    pre_split_qkv=True: the fused-qkv img path is dead code in the
    reference forward (img_attn_q/k/v are referenced unconditionally —
    the app always splits via get_linear_split_map).  The block
    hard-casts modulated streams to bf16 (its production dtype), so the
    golden carries bf16-grade tolerance."""
    import importlib
    hymods = _module("refmodels.hyvideo.modules")
    hymods.__path__ = [os.path.join(REF, "models", "hyvideo", "modules")]
    # byT5 pulls the real text_encoder/__init__ (transformers model zoo)
    # — not exercised by the block golden
    _module("refmodels.hyvideo.text_encoder")
    _module("refmodels.hyvideo.text_encoder.byT5",
            ByT5Mapper=type("ByT5Mapper", (), {}))
    models = importlib.import_module("refmodels.hyvideo.modules.models")
    posemb = importlib.import_module(
        "refmodels.hyvideo.modules.posemb_layers")

    torch.manual_seed(51)
    h, n = 32, 2
    grid = (2, 2, 3)
    lt = 4
    li = grid[0] * grid[1] * grid[2]
    rope_dims = [4, 6, 6]
    # bf16: the forward hard-casts modulated streams to bf16
    # (models.py:213 `.to(torch.bfloat16)`) — its production dtype;
    # float64 weights would dtype-mismatch.  The golden therefore
    # carries bf16-grade tolerance.
    blk = models.MMDoubleStreamBlock(h, n, mlp_width_ratio=2.0,
                                     qkv_bias=True, pre_split_qkv=True,
                                     dtype=torch.bfloat16).eval()

    rng = np.random.default_rng(52)
    img = torch.tensor(rng.standard_normal((1, li, h)),
                       dtype=torch.bfloat16)
    txt = torch.tensor(rng.standard_normal((1, lt, h)),
                       dtype=torch.bfloat16)
    vec = torch.tensor(rng.standard_normal((1, h)) * 0.5,
                       dtype=torch.bfloat16)
    cos, sin = posemb.get_nd_rotary_pos_embed(
        rope_dims, list(grid), theta=256, use_real=True,
        theta_rescale_factor=1, enable_riflex=False)

    with torch.no_grad():
        out_img, out_txt = blk(img.clone(), txt.clone(), vec,
                               freqs_cis=(cos, sin))

    f32 = lambda t: t.float().numpy().astype(np.float32)
    save("hyvideo_block_ref.npz", img=f32(img), txt=f32(txt), vec=f32(vec),
         out_img=f32(out_img), out_txt=f32(out_txt),
         grid=np.array(grid), rope_dims=np.array(rope_dims),
         dims=np.array([h, n, int(h * 2.0)]),
         rope_cos=cos.numpy().astype(np.float32),
         rope_sin=sin.numpy().astype(np.float32),
         **{k.replace(".", "__"): f32(v)
            for k, v in blk.state_dict().items()})


def gen_ltx2_block_ref():
    """Executes the reference's LTX-2 BasicAVTransformerBlock
    (models/ltx2/ltx_core/model/transformer/transformer.py:58) — video +
    audio self/text-cross/av-cross/FFN with gated attention — using the
    module's own precompute_freqs_cis interleaved rope, float64.  The
    ltx_core package __init__s pull the loader stack, so the package
    modules are registered with __path__ only (same pattern as the wan/
    flux/hyvideo goldens)."""
    import importlib
    for name, parts in [
            ("refmodels.ltx2", ("ltx2",)),
            ("refmodels.ltx2.ltx_core", ("ltx2", "ltx_core")),
            ("refmodels.ltx2.ltx_core.guidance",
             ("ltx2", "ltx_core", "guidance")),
            ("refmodels.ltx2.ltx_core.model", ("ltx2", "ltx_core", "model")),
            ("refmodels.ltx2.ltx_core.model.transformer",
             ("ltx2", "ltx_core", "model", "transformer"))]:
        m = _module(name)
        m.__path__ = [os.path.join(REF, "models", *parts)]
    tr = importlib.import_module(
        "refmodels.ltx2.ltx_core.model.transformer.transformer")
    targs = importlib.import_module(
        "refmodels.ltx2.ltx_core.model.transformer.transformer_args")
    rope = importlib.import_module(
        "refmodels.ltx2.ltx_core.model.transformer.rope")

    torch.manual_seed(61)
    dv, hv, da, ha = 64, 4, 32, 2     # video dim/heads, audio dim/heads
    blk = tr.BasicAVTransformerBlock(
        idx=0,
        video=tr.TransformerConfig(dim=dv, heads=hv, d_head=dv // hv,
                                   context_dim=dv,
                                   apply_gated_attention=True),
        audio=tr.TransformerConfig(dim=da, heads=ha, d_head=da // ha,
                                   context_dim=da,
                                   apply_gated_attention=True),
        rope_type=rope.LTXRopeType.INTERLEAVED,
        attention_function=tr.AttentionFunction.PYTORCH,
    ).float().eval()   # fp32: the reference's in-place rms_norm pins the
    # norm accumulation to fp32 (utils.py:9), rejecting float64 inputs
    with torch.no_grad():
        # the scale_shift tables are allocated with torch.empty
        for t in (blk.scale_shift_table, blk.audio_scale_shift_table,
                  blk.scale_shift_table_a2v_ca_audio,
                  blk.scale_shift_table_a2v_ca_video):
            t.normal_(0.0, 0.2)

    rng = np.random.default_rng(62)
    t64 = lambda a: torch.tensor(a, dtype=torch.float32)
    frames, per_f_v, per_f_a, lctx = 2, 4, 3, 5
    lv, la = frames * per_f_v, frames * per_f_a
    vx = t64(rng.standard_normal((1, lv, dv)))
    ax = t64(rng.standard_normal((1, la, da)))
    v_ctx = t64(rng.standard_normal((1, lctx, dv)))
    a_ctx = t64(rng.standard_normal((1, lctx, da)))
    v_t = t64(rng.standard_normal((1, frames, 6 * dv)) * 0.2)
    a_t = t64(rng.standard_normal((1, frames, 6 * da)) * 0.2)
    v_css = t64(rng.standard_normal((1, frames, 4 * dv)) * 0.2)
    a_css = t64(rng.standard_normal((1, frames, 4 * da)) * 0.2)
    v_cg = t64(rng.standard_normal((1, frames, dv)) * 0.2)
    a_cg = t64(rng.standard_normal((1, frames, da)) * 0.2)

    # the model's own fractional-position ropes: video (t,y,x) for self
    # attention at the video inner dim; temporal-only at the a2v inner
    # dim (audio-sized) for the av cross attentions
    gv = np.stack([np.repeat(np.arange(frames), per_f_v),
                   np.tile(np.repeat(np.arange(2), 2), frames),
                   np.tile(np.arange(2), 2 * frames)])[None]
    ga = np.stack([np.repeat(np.arange(frames), per_f_a)])[None]
    gvx = gv[:, :1]
    pe = lambda grid, dim, mp: rope.precompute_freqs_cis(
        t64(grid), dim, torch.float32, theta=10000.0, max_pos=mp,
        rope_type=rope.LTXRopeType.INTERLEAVED,
        freq_grid_generator=rope.generate_freq_grid_np)
    pe_v = pe(gv, dv, [20, 2048, 2048])
    pe_a = pe(ga, da, [20])
    pe_vx = pe(gvx, da, [20])
    pe_ax = pe(ga, da, [20])

    def args(x, ctx, t, pe_self, pe_cross, css, cg):
        return targs.TransformerArgs(
            x=x.clone(), context=ctx, context_mask=None, timesteps=t,
            embedded_timestep=torch.zeros_like(t),
            positional_embeddings=pe_self,
            cross_positional_embeddings=pe_cross,
            cross_scale_shift_timestep=css, cross_gate_timestep=cg)

    with torch.no_grad():
        out_v, out_a = blk(args(vx, v_ctx, v_t, pe_v, pe_vx, v_css, v_cg),
                           args(ax, a_ctx, a_t, pe_a, pe_ax, a_css, a_cg))

    f32 = lambda t: t.numpy().astype(np.float32)
    save("ltx2_block_ref.npz",
         vx=f32(vx), ax=f32(ax), v_ctx=f32(v_ctx), a_ctx=f32(a_ctx),
         v_t=f32(v_t), a_t=f32(a_t), v_css=f32(v_css), a_css=f32(a_css),
         v_cg=f32(v_cg), a_cg=f32(a_cg),
         pe_v_cos=f32(pe_v[0]), pe_v_sin=f32(pe_v[1]),
         pe_a_cos=f32(pe_a[0]), pe_a_sin=f32(pe_a[1]),
         pe_vx_cos=f32(pe_vx[0]), pe_vx_sin=f32(pe_vx[1]),
         pe_ax_cos=f32(pe_ax[0]), pe_ax_sin=f32(pe_ax[1]),
         out_v=f32(out_v.x), out_a=f32(out_a.x),
         dims=np.array([dv, hv, da, ha]),
         **{k.replace(".", "__"): f32(v)
            for k, v in blk.state_dict().items()})


def gen_hdr_ref():
    """hdr_ref.npz — shared/utils/hdr.py LogC3 compress/decompress,
    linear->sRGB tonemap, and the vae-range carriers, executed from the
    reference module itself (torch-only, no shims needed)."""
    import importlib
    hdr = importlib.import_module("shared.utils.hdr")
    torch.manual_seed(0)
    x = torch.rand(2, 7, 5, 3) * 4.0          # linear HDR up to 4x white
    logc = hdr.LogC3().compress(x)
    rt = hdr.LogC3().decompress(logc)
    vae = hdr.hdr_linear_to_vae_range(x)
    # the reference mutates its input in place (hdr.py:64 add_/mul_) —
    # hand it a clone so the saved `vae` golden stays intact
    back = hdr.vae_range_to_hdr_linear(vae.clone())
    tm = hdr.tonemap_hdr_tensor_to_uint8(
        x.permute(3, 0, 1, 2), exposure=-1.0)   # [C,F,H,W] layout
    save("hdr_ref.npz", x=x.numpy(), logc=logc.numpy(), rt=rt.numpy(),
         vae=vae.numpy(), back=back.numpy(),
         tonemap=tm.permute(1, 2, 3, 0).numpy(),
         consts=np.array([hdr.HDR_REFERENCE_WHITE_NITS]),
         zscale=np.frombuffer(hdr.hdr10_zscale_filter().encode(), np.uint8),
         x265=np.frombuffer(hdr.hdr10_x265_params().encode(), np.uint8))


def gen_qwen_block_ref():
    """Executes the reference's QwenImageTransformerBlock and its own
    QwenEmbedRope (models/qwen/transformer_qwenimage.py:480 / :149,
    scale_rope=True — the production config, :770), float64 weights.

    diffusers is absent in this image, so minimal shims provide the
    module LAYOUT diffusers would (Attention with to_q/add_q_proj/
    norm_q/to_out[0]/to_add_out, FeedForward net.0.proj/net.2, RMSNorm
    with fp32-variance semantics) — every line of attention/modulation
    math executed is the reference's own
    (QwenDoubleStreamAttnProcessor2_0, _modulate_inplace,
    apply_rotary_emb_qwen_inplace, _apply_ffn_chunked)."""
    import importlib
    import torch.nn as nn
    import torch.nn.functional as F

    class RMSNorm(nn.Module):
        # diffusers.models.normalization.RMSNorm: fp32 variance, the
        # normalized product stays in the wider dtype until the final
        # cast back to the input dtype
        def __init__(self, dim, eps=1e-6, elementwise_affine=True,
                     bias=False):
            super().__init__()
            self.eps = eps
            self.weight = (nn.Parameter(torch.ones(dim))
                           if elementwise_affine else None)

        def forward(self, x):
            dt = x.dtype
            var = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
            y = x * torch.rsqrt(var + self.eps)
            if self.weight is not None:
                if self.weight.dtype in (torch.float16, torch.bfloat16):
                    y = y.to(self.weight.dtype)
                y = y * self.weight
            return y.to(dt)

    class Attention(nn.Module):
        # exactly the attribute layout the reference's
        # QwenDoubleStreamAttnProcessor2_0 addresses (:374-480)
        def __init__(self, query_dim, cross_attention_dim=None,
                     added_kv_proj_dim=None, dim_head=64, heads=8,
                     out_dim=None, context_pre_only=None, bias=False,
                     processor=None, qk_norm=None, eps=1e-5, **kw):
            super().__init__()
            inner = out_dim if out_dim is not None else dim_head * heads
            self.heads = (out_dim // dim_head if out_dim is not None
                          else heads)
            self.to_q = nn.Linear(query_dim, inner, bias=bias)
            self.to_k = nn.Linear(query_dim, inner, bias=bias)
            self.to_v = nn.Linear(query_dim, inner, bias=bias)
            self.add_q_proj = nn.Linear(added_kv_proj_dim, inner, bias=True)
            self.add_k_proj = nn.Linear(added_kv_proj_dim, inner, bias=True)
            self.add_v_proj = nn.Linear(added_kv_proj_dim, inner, bias=True)
            mk = ((lambda: RMSNorm(dim_head, eps=eps))
                  if qk_norm == "rms_norm" else (lambda: None))
            self.norm_q, self.norm_k = mk(), mk()
            self.norm_added_q, self.norm_added_k = mk(), mk()
            self.to_out = nn.ModuleList(
                [nn.Linear(inner, out_dim or query_dim, bias=True),
                 nn.Dropout(0.0)])
            self.to_add_out = nn.Linear(inner, out_dim or query_dim,
                                        bias=True)
            self.processor = processor

    class GELUProj(nn.Module):
        def __init__(self, dim_in, dim_out, approximate="none", bias=True):
            super().__init__()
            self.proj = nn.Linear(dim_in, dim_out, bias=bias)
            self.approximate = approximate

        def forward(self, x):
            return F.gelu(self.proj(x), approximate=self.approximate)

    class FeedForward(nn.Module):
        # diffusers "gelu-approximate" layout: net.0.proj -> net.2
        def __init__(self, dim, dim_out=None, mult=4, dropout=0.0,
                     activation_fn="geglu", inner_dim=None, bias=True,
                     **kw):
            super().__init__()
            assert activation_fn == "gelu-approximate"
            inner_dim = inner_dim or int(dim * mult)
            self.net = nn.ModuleList(
                [GELUProj(dim, inner_dim, approximate="tanh", bias=bias),
                 nn.Dropout(dropout),
                 nn.Linear(inner_dim, dim_out or dim, bias=bias)])

        def forward(self, x):
            for m in self.net:
                x = m(x)
            return x

    _module("diffusers.models.attention", FeedForward=FeedForward)
    _module("diffusers.models.attention_processor", Attention=Attention)
    _module("diffusers.models.embeddings",
            TimestepEmbedding=type("TimestepEmbedding", (nn.Module,), {}),
            Timesteps=type("Timesteps", (nn.Module,), {}))
    _module("diffusers.models.normalization",
            AdaLayerNormContinuous=type("AdaLayerNormContinuous",
                                        (nn.Module,), {}),
            RMSNorm=RMSNorm)
    mo = sys.modules.get("diffusers.models.modeling_outputs")
    if mo is not None and not hasattr(mo, "Transformer2DModelOutput"):
        mo.Transformer2DModelOutput = type("Transformer2DModelOutput",
                                           (), {})

    qwen = _module("refmodels.qwen")
    qwen.__path__ = [os.path.join(REF, "models", "qwen")]
    tq = importlib.import_module("refmodels.qwen.transformer_qwenimage")

    torch.manual_seed(71)
    d, n, hd = 32, 2, 16
    grid, lt = (1, 4, 4), 5
    li = grid[0] * grid[1] * grid[2]
    blk = tq.QwenImageTransformerBlock(
        dim=d, num_attention_heads=n, attention_head_dim=hd).double().eval()
    rope = tq.QwenEmbedRope(theta=10_000, axes_dim=[4, 6, 6],
                            scale_rope=True)
    vid_freqs, txt_freqs = rope(grid, [lt], torch.device("cpu"))

    rng = np.random.default_rng(72)
    img = torch.tensor(rng.standard_normal((1, li, d)), dtype=torch.float64)
    txt = torch.tensor(rng.standard_normal((1, lt, d)), dtype=torch.float64)
    vec = torch.tensor(rng.standard_normal((1, d)) * 0.5,
                       dtype=torch.float64)

    with torch.no_grad():
        # the reference forward mutates its inputs in place (addcmul_)
        out_txt, out_img = blk(img.clone(), txt.clone(),
                               encoder_hidden_states_mask=None, temb=vec,
                               image_rotary_emb=(vid_freqs, txt_freqs))

    f32 = lambda t: t.numpy().astype(np.float32)
    save("qwen_block_ref.npz", img=f32(img), txt=f32(txt), vec=f32(vec),
         out_img=f32(out_img), out_txt=f32(out_txt),
         vid_freqs=vid_freqs.numpy(), txt_freqs=txt_freqs.numpy(),
         dims=np.array([d, n, hd]), grid=np.array(grid),
         **{k.replace(".", "__"): f32(v)
            for k, v in blk.state_dict().items()})


def gen_wan_vae_ref():
    """Executes the reference's OWN WanVAE_ (models/wan/modules/vae.py:547)
    end-to-end in float64 at tiny dims: the real chunked encode
    ([1, 4, ...] frames through feat caches, :586-614) and the real
    frame-streamed decode (one latent frame at a time with the 'Rep'
    zero-window first-frame upsample semantics, :629-662).  This is the
    strongest check that the repo's full-sequence causal-conv form
    (wan2gp_tpu/models/wan/vae.py) is mathematically equivalent to the
    reference's cache-streamed form — block-level goldens cannot see a
    streaming/chunking mismatch."""
    import importlib
    vae_mod = importlib.import_module("refmodels.wan.modules.vae")

    torch.manual_seed(81)
    model = vae_mod.WanVAE_(dim=8, z_dim=16, dim_mult=[1, 2],
                            num_res_blocks=1, attn_scales=[],
                            temperal_downsample=[True]).double().eval()
    rng = np.random.default_rng(82)
    x = torch.tensor(rng.standard_normal((1, 3, 5, 16, 16)) * 0.5,
                     dtype=torch.float64)
    with torch.no_grad():
        mu = model.encode(x, scale=None)          # raw (unnormalized) mu
        out = model.decode(mu.clone(), scale=None)

    f32 = lambda t: t.numpy().astype(np.float32)
    save("wan_vae_ref.npz", x=f32(x), mu=f32(mu), out=f32(out),
         **{k.replace(".", "__"): f32(v)
            for k, v in model.state_dict().items()})


def gen_wan22_vae_ref():
    """Executes the reference's OWN Wan 2.2 VAE WanVAE_
    (models/wan/modules/vae2_2.py:753) end-to-end in float64 at tiny
    dims (4 stages, the production stage topology): real patchified
    chunked encode and frame-streamed decode with the AvgDown3D/DupUp3D
    parameter-free shortcuts and first_chunk frame-drop semantics
    (:389-430).  Validates wan2gp_tpu/models/wan/vae2_2.py's
    full-sequence form AND io/wan_checkpoint.py load_wan22_vae_params."""
    import importlib
    vae_mod = importlib.import_module("refmodels.wan.modules.vae2_2")

    torch.manual_seed(91)
    model = vae_mod.WanVAE_(dim=4, dec_dim=4, z_dim=48,
                            dim_mult=[1, 2, 4, 4], num_res_blocks=1,
                            attn_scales=[],
                            temperal_downsample=[False, True, True]
                            ).double().eval()
    rng = np.random.default_rng(92)
    x = torch.tensor(rng.standard_normal((1, 3, 5, 32, 32)) * 0.5,
                     dtype=torch.float64)
    with torch.no_grad():
        mu = model.encode(x, scale=None)          # raw (unnormalized) mu
        out = model.decode(mu.clone(), scale=None)

    f32 = lambda t: t.numpy().astype(np.float32)
    save("wan22_vae_ref.npz", x=f32(x), mu=f32(mu), out=f32(out),
         **{k.replace(".", "__"): f32(v)
            for k, v in model.state_dict().items()})


if __name__ == "__main__":
    sys.path.insert(0, REF)
    install_shims()
    gen_unipc_ref()
    gen_dpm_ref()
    gen_flowmatch_ref()
    gen_wan_block_ref()
    gen_hdr_ref()
    gen_qwen_block_ref()
    gen_wan_vae_ref()
