"""Shape/behavior tests for the model zoo (small configs for fast compiles)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stain2stain_tpu.models import (
    SegmentationUNet,
    SharedEncoder,
    SimpleDenseNet,
    FlowMatchingDecoder,
    SegmentationDecoder,
    TimeEmbedding,
    UNet4to3,
    UNetModel,
)

RNG = jax.random.key(0)


def small_unet(**kw):
    defaults = dict(
        dim=(3, 32, 32),
        num_channels=32,
        num_res_blocks=1,
        channel_mult=(1, 2),
        attention_resolutions="16",  # ds = 32//16 = 2 → attention at level 1
        num_heads=2,
        num_head_channels=16,
    )
    defaults.update(kw)
    return UNetModel(**defaults)


def test_unet_forward_shape_and_zero_init():
    net = small_unet()
    x = jax.random.normal(RNG, (2, 32, 32, 3))
    t = jnp.array([0.1, 0.9])
    variables = net.init(RNG, t, x)
    out = net.apply(variables, t, x)
    assert out.shape == (2, 32, 32, 3)
    # Final conv is zero-init → initial velocity is exactly 0 (ADM convention).
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_unet_attention_resolution_parsing():
    net = small_unet()
    assert net._attention_ds() == (2,)
    net2 = small_unet(attention_resolutions=(1, 2))
    assert net2._attention_ds() == (1, 2)
    names = jax.tree_util.tree_leaves_with_path(
        net.init(RNG, jnp.array([0.5, 0.5]), jnp.zeros((2, 32, 32, 3)))
    )
    joined = " ".join(jax.tree_util.keystr(p) for p, _ in names)
    assert "['down_1']['block_0']['attn']" in joined and "['mid']['attn']" in joined
    assert "['down_0']['block_0']['attn']" not in joined  # no attention at ds=1


def test_unet_class_conditional():
    net = small_unet(class_cond=True, num_classes=3)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.array([0.5, 0.5])
    y = jnp.array([0, 2])
    variables = net.init(RNG, t, x, y)
    out = net.apply(variables, t, x, y)
    assert out.shape == (2, 32, 32, 3)
    with pytest.raises(ValueError):
        net.apply(variables, t, x, None)


def test_unet_scalar_t_broadcast():
    net = small_unet()
    x = jnp.zeros((2, 32, 32, 3))
    variables = net.init(RNG, jnp.array(0.5), x)
    out = net.apply(variables, jnp.array(0.5), x)
    assert out.shape == (2, 32, 32, 3)


def test_unet_4ch_in_3ch_out():
    net = small_unet(dim=(4, 32, 32), out_channels=3)
    x = jnp.zeros((1, 32, 32, 4))
    t = jnp.array([0.3])
    variables = net.init(RNG, t, x)
    assert net.apply(variables, t, x).shape == (1, 32, 32, 3)


def test_unet_bf16_compute_f32_out():
    net = small_unet(dtype=jnp.bfloat16)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.array([0.5])
    variables = net.init(RNG, t, x)
    out = net.apply(variables, t, x)
    assert out.dtype == jnp.float32
    # Params stay f32 (param_dtype default) for optimizer stability.
    kernel = variables["params"]["conv_stem"]["kernel"]
    assert kernel.dtype == jnp.float32


def test_unet_dropout_requires_rng_in_train():
    net = small_unet(dropout=0.5)
    x = jnp.ones((2, 32, 32, 3))
    t = jnp.array([0.5, 0.5])
    variables = net.init(RNG, t, x)
    out1 = net.apply(variables, t, x, train=True, rngs={"dropout": jax.random.key(1)})
    out2 = net.apply(variables, t, x, train=True, rngs={"dropout": jax.random.key(2)})
    # different dropout masks → different internal activations, but zero-init
    # out conv keeps final output 0; check it at least runs deterministically
    out3 = net.apply(variables, t, x, train=False)
    assert out1.shape == out2.shape == out3.shape


def test_unet_param_count_flagship_config_scale():
    # Flagship config (configs/model/conditional_flow_matching.yaml:16-26):
    # ADM UNet, ch=128, mult (1,2,2,4), 2 res-blocks, scale-shift norm. The
    # analytic param count of that architecture is ~71M (down ~17M, middle
    # ~11.5M w/ attention, up ~41.5M, embeddings/stem ~1M); verify our
    # re-derivation lands there.
    net = UNetModel(
        dim=(3, 256, 256),
        num_channels=128,
        num_res_blocks=2,
        channel_mult=(1, 2, 2, 4),
        attention_resolutions="16,8",
        num_heads=4,
        num_head_channels=32,
        use_scale_shift_norm=True,
    )
    variables = jax.eval_shape(
        lambda: net.init(RNG, jnp.zeros((1,)), jnp.zeros((1, 256, 256, 3)))
    )
    n_params = sum(np.prod(v.shape) for v in jax.tree_util.tree_leaves(variables["params"]))
    assert 60e6 < n_params < 85e6, f"param count {n_params/1e6:.1f}M out of expected range"


# ------------------------------------------------------- multitask components
def test_shared_encoder_and_decoders_roundtrip():
    feats = (8, 16, 32)
    enc = SharedEncoder(in_channels=3, features=feats)
    x = jnp.zeros((2, 16, 16, 3))
    variables = enc.init(RNG, x)
    bottleneck, skips = enc.apply(variables, x)
    assert bottleneck.shape == (2, 4, 4, 32)
    assert [s.shape[-1] for s in skips] == [16, 8]  # deepest-first, no bottleneck

    t_emb = TimeEmbedding(dim=32)(jnp.array([0.1, 0.7]))
    assert t_emb.shape == (2, 32)

    flow_dec = FlowMatchingDecoder(bottleneck_channels=32, features=(16, 8), out_channels=3, time_emb_dim=32)
    fvars = flow_dec.init(RNG, bottleneck, skips, t_emb)
    vel = flow_dec.apply(fvars, bottleneck, skips, t_emb)
    assert vel.shape == (2, 16, 16, 3)

    seg_dec = SegmentationDecoder(bottleneck_channels=32, features=(16, 8), out_channels=5)
    svars = seg_dec.init(RNG, bottleneck, skips)
    logits = seg_dec.apply(svars, bottleneck, skips)
    assert logits.shape == (2, 16, 16, 5)


def test_segmentation_unet_shape():
    net = SegmentationUNet(features=(8, 16), out_channels=1)
    x = jnp.zeros((1, 16, 16, 3))
    variables = net.init(RNG, x)
    assert net.apply(variables, x).shape == (1, 16, 16, 1)


def test_simple_dense_net():
    net = SimpleDenseNet(input_size=64, lin1_size=8, lin2_size=8, lin3_size=8, output_size=10)
    x = jnp.zeros((4, 8, 8, 1))
    variables = net.init(RNG, x)
    assert net.apply(variables, x).shape == (4, 10)


def test_unet4to3_wrapper():
    net = UNet4to3(image_size=16, num_channels=16, num_res_blocks=1, channel_mult=(1, 2), attention_resolutions="")
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.array([0.5])
    variables = net.init(RNG, t, x)
    assert net.apply(variables, t, x).shape == (1, 16, 16, 3)


def test_shared_encoder_batchnorm_mode():
    enc = SharedEncoder(in_channels=3, features=(4, 8), norm="batch")
    x = jnp.ones((2, 8, 8, 3))
    variables = enc.init(RNG, x)
    assert "batch_stats" in variables
    (bottleneck, _), updates = enc.apply(variables, x, train=True, mutable=["batch_stats"])
    assert bottleneck.shape == (2, 4, 4, 8)
    assert "batch_stats" in updates


@pytest.mark.parametrize("mode", [True, "block", "level", "block:1", "level:1"])
def test_unet_remat_knob_gradients(mode):
    # use_checkpoint must trace/compile with static train flag, accept the
    # SAME variables as the non-remat module (parameter-structure contract),
    # and give the same loss/grads. Params are randomized away from the
    # zero-init output conv — with it, the loss gradient is identically zero
    # and the comparison would be vacuous.
    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 16, 3)), jnp.float32)
    t = jnp.array([0.3, 0.7])
    base = small_unet(dropout=0.1)
    remat = base.clone(use_checkpoint=mode)
    variables = base.init(RNG, t, x)
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.key(7), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape, l.dtype) * 0.05 for k, l in zip(keys, leaves)]
    )

    def loss(net):
        return lambda v: jnp.sum(jnp.square(net.apply(v, t, x, train=True, rngs={"dropout": jax.random.key(0)})))

    l0, g0 = jax.value_and_grad(loss(base))(variables)
    l1, g1 = jax.value_and_grad(loss(remat))(variables)
    assert float(l0) > 0
    scale = max(float(jnp.abs(a).max()) for a in jax.tree_util.tree_leaves(g0))
    assert scale > 0, "gradient comparison would be vacuous"
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3 * max(scale, 1.0))


@pytest.mark.slow
def test_unet_512_train_step_compiles_cpu():
    # The reference's default tile size is 512 (configs/data/paired_data.yaml:8).
    # The axon remote-compile helper on this box crashes on 512px fwd+bwd
    # programs (infrastructure); prove the framework side — trace, lower and
    # compile the full flagship-architecture 512 grad step — on the CPU
    # backend instead.
    import jax
    import numpy as np

    cpu = jax.devices("cpu")[0]
    net = UNetModel(
        dim=(3, 512, 512), num_channels=128, num_res_blocks=2, channel_mult=(1, 2, 2, 4),
        attention_resolutions="16,8", num_heads=4, num_head_channels=32,
        use_scale_shift_norm=True, use_checkpoint="level", dropout=0.1,
        fused_attention=False,  # Pallas kernels don't lower for CPU
    )
    x = jnp.zeros((1, 512, 512, 3), jnp.float32)
    t = jnp.zeros((1,), jnp.float32)
    variables = jax.eval_shape(lambda: net.init(RNG, t, x))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype, device=cpu), variables
    )

    def loss(v):
        out = net.apply(v, t, x, train=True, rngs={"dropout": jax.random.key(0)})
        return jnp.sum(jnp.square(out))

    compiled = jax.jit(jax.grad(loss), device=cpu).lower(variables).compile()
    assert compiled is not None


def test_upsample_bilinear_matches_torch_align_corners():
    """The decoders' 2x upsample must match the reference's
    nn.Upsample(mode='bilinear', align_corners=True) exactly (review r3:
    jax.image.resize is half-pixel — every pixel differed)."""
    torch = pytest.importorskip("torch")
    from stain2stain_tpu.models.task_decoders import _upsample_bilinear

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(_upsample_bilinear(jnp.asarray(x)))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="bilinear", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_segmentation_unet_reference_widths():
    """bilinear=True halves the doubled widths (ref segmentation_unet.py:
    factor=2): bottleneck 512 and decoder 256/128/64/64 for the default
    [64,128,256,512] features."""
    from stain2stain_tpu.models import SegmentationUNet

    net = SegmentationUNet(in_channels=3, out_channels=1)
    variables = net.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    params = variables["params"]
    assert params["bottleneck"]["conv_1"]["kernel"].shape[-1] == 512
    for i, want in enumerate([256, 128, 64, 64]):
        assert params[f"dec_{i}"]["conv"]["conv_1"]["kernel"].shape[-1] == want
    out = net.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert out.shape == (1, 32, 32, 1)
