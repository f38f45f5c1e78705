"""Model tests: Generator/Discriminator shapes and numerical parity of the
converted weights against an independent torch functional realization of the
published Real-ESRGAN op graph (conv weights random — this validates layout,
padding, activation and residual-scaling semantics, i.e. exactly what weight
conversion correctness depends on)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from real_esrgan_tpu.models import Generator, UNetDiscriminator, ema_init, ema_update
from real_esrgan_tpu.models.convert import (
    convert_generator, export_generator, strip_prefix,
)

RNG = np.random.default_rng(7)


def _rand_conv(cin, cout, k=3):
    w = (RNG.standard_normal((cout, cin, k, k)) * 0.05).astype(np.float32)
    b = (RNG.standard_normal(cout) * 0.01).astype(np.float32)
    return torch.from_numpy(w), torch.from_numpy(b)


def _make_torch_generator_state(num_rrdb=2, ch=64, gc=32, cin=3):
    """Random weights using the reference checkpoint key grammar."""
    sd = {}

    def add(name, cin_, cout_):
        w, b = _rand_conv(cin_, cout_)
        sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = b

    add("conv1", cin, ch)
    for i in range(num_rrdb):
        for j in (1, 2, 3):
            for k in (1, 2, 3, 4, 5):
                cin_k = ch + gc * (k - 1)
                cout_k = ch if k == 5 else gc
                add(f"trunk.{i}.rdb{j}.conv{k}", cin_k, cout_k)
    add("conv2", ch, ch)
    add("upsampling1.0", ch, ch)
    add("upsampling2.0", ch, ch)
    add("conv3.0", ch, ch)
    add("conv4", ch, 3)
    return sd


def _torch_generator_forward(sd, x, num_rrdb=2):
    """Independent functional torch forward of the Real-ESRGAN generator
    (x4 path: no pixel-unshuffle)."""

    def conv(name, t):
        return F.conv2d(t, sd[f"{name}.weight"], sd[f"{name}.bias"], padding=1)

    def lrelu(t):
        return F.leaky_relu(t, 0.2)

    def rdb(prefix, t):
        o1 = lrelu(conv(f"{prefix}.conv1", t))
        o2 = lrelu(conv(f"{prefix}.conv2", torch.cat([t, o1], 1)))
        o3 = lrelu(conv(f"{prefix}.conv3", torch.cat([t, o1, o2], 1)))
        o4 = lrelu(conv(f"{prefix}.conv4", torch.cat([t, o1, o2, o3], 1)))
        o5 = conv(f"{prefix}.conv5", torch.cat([t, o1, o2, o3, o4], 1))
        return o5 * 0.2 + t

    out1 = conv("conv1", x)
    out = out1
    for i in range(num_rrdb):
        identity = out
        for j in (1, 2, 3):
            out = rdb(f"trunk.{i}.rdb{j}", out)
        out = out * 0.2 + identity
    out = out1 + conv("conv2", out)
    out = lrelu(conv("upsampling1.0", F.interpolate(out, scale_factor=2, mode="nearest")))
    out = lrelu(conv("upsampling2.0", F.interpolate(out, scale_factor=2, mode="nearest")))
    out = lrelu(conv("conv3.0", out))
    out = conv("conv4", out)
    return torch.clamp(out, 0.0, 1.0)


def test_generator_matches_torch_graph():
    sd = _make_torch_generator_state(num_rrdb=2)
    x = RNG.random((2, 3, 12, 12)).astype(np.float32)

    with torch.no_grad():
        expected = _torch_generator_forward(sd, torch.from_numpy(x)).numpy()

    params = convert_generator(sd)
    g = Generator(upscale_factor=4, num_rrdb=2)
    out = g.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    out = np.array(out).transpose(0, 3, 1, 2)

    assert out.shape == expected.shape == (2, 3, 48, 48)
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_generator_ema_prefix_strip():
    sd = _make_torch_generator_state(num_rrdb=1)
    ema_sd = {f"model.{k}": v for k, v in sd.items()}
    p1 = convert_generator(sd)
    p2 = convert_generator(ema_sd)
    jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)


def test_generator_export_roundtrip():
    sd = _make_torch_generator_state(num_rrdb=1)
    params = convert_generator(sd)
    back = export_generator(params)
    assert set(back.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), atol=0)


def test_generator_pixel_unshuffle_paths():
    for upscale, in_hw, factor_ch in [(2, 16, 12), (1, 16, 48)]:
        g = Generator(upscale_factor=upscale, num_rrdb=1)
        params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, in_hw, in_hw, 3)))["params"]
        out = g.apply({"params": params}, jnp.ones((1, in_hw, in_hw, 3)) * 0.4)
        # net always multiplies spatial dims by 4 relative to the unshuffled grid
        assert out.shape == (1, in_hw * upscale, in_hw * upscale, 3)
        assert params["conv1"]["kernel"].shape[2] == factor_ch


def test_generator_remat_equivalence():
    x = jnp.asarray(RNG.random((1, 8, 8, 3)).astype(np.float32))
    g1 = Generator(num_rrdb=2, remat=False)
    g2 = Generator(num_rrdb=2, remat=True)
    params = g1.init(jax.random.PRNGKey(2), x)["params"]
    np.testing.assert_allclose(np.array(g1.apply({"params": params}, x)),
                               np.array(g2.apply({"params": params}, x)), atol=1e-6)


def test_discriminator_shapes_and_state():
    d = UNetDiscriminator()
    variables = d.init(jax.random.PRNGKey(1), jnp.zeros((2, 64, 64, 3)))
    out, new_state = d.apply(variables, jnp.ones((2, 64, 64, 3)) * 0.3,
                             update_stats=True, mutable=["batch_stats"])
    assert out.shape == (2, 64, 64, 1)
    # spectral norm power-iteration state must actually update
    before = variables["batch_stats"]["SpectralNorm_0"]["down1/kernel/u"]
    after = new_state["batch_stats"]["SpectralNorm_0"]["down1/kernel/u"]
    assert not np.allclose(np.array(before), np.array(after))


def test_ema_pytree():
    params = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    ema = ema_init(params)
    new_params = {"a": jnp.full(3, 2.0), "b": {"c": jnp.ones(2)}}
    ema2 = ema_update(ema, new_params, 0.9)
    np.testing.assert_allclose(np.array(ema2["a"]), 1.1)
    np.testing.assert_allclose(np.array(ema2["b"]["c"]), 0.1)


def test_subpixel_upsample_equivalence():
    """The subpixel upsampling conv must equal upsample->conv exactly
    (same params, float32), including image edges."""
    x = jnp.asarray(RNG.random((2, 7, 5, 3)).astype(np.float32))
    g_sub = Generator(num_rrdb=1, subpixel=True)
    g_ref = Generator(num_rrdb=1, subpixel=False)
    params = g_sub.init(jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 3)))["params"]
    a = np.array(g_sub.apply({"params": params}, x))
    b = np.array(g_ref.apply({"params": params}, x))
    assert a.shape == b.shape == (2, 28, 20, 3)
    np.testing.assert_allclose(a, b, atol=3e-6)


def test_st_clamp_escapes_saturation():
    """The output clamp must pass gradients outside [0,1] (st_clamp=True,
    default) — the reference's hard clamp zeroes them, which kills training
    as soon as a bright batch saturates every pixel (observed on real data).
    Values must be identical either way."""
    from real_esrgan_tpu.models.rrdbnet import _st_clamp

    x = jnp.asarray([-2.0, 0.5, 3.0])
    np.testing.assert_allclose(np.asarray(_st_clamp(x)), [0.0, 0.5, 1.0])
    g = jax.grad(lambda v: jnp.sum(_st_clamp(v)))(x)
    np.testing.assert_allclose(np.asarray(g), [1.0, 1.0, 1.0])

    # a generator whose conv4 bias forces full saturation: gradients to the
    # trunk must survive with st_clamp and vanish with the hard clamp
    x_img = jnp.asarray(RNG.random((1, 8, 8, 3)).astype(np.float32))
    for st, expect_grad in ((True, True), (False, False)):
        gmodel = Generator(num_rrdb=1, st_clamp=st)
        params = gmodel.init(jax.random.PRNGKey(0), x_img)["params"]
        params["conv4"]["bias"] = params["conv4"]["bias"] + 10.0  # all pixels > 1

        def loss(p):
            return jnp.mean(jnp.abs(gmodel.apply({"params": p}, x_img) - 0.5))

        grads = jax.grad(loss)(params)
        gnorm = float(sum(jnp.sum(g ** 2) for g in jax.tree_util.tree_leaves(grads)))
        assert (gnorm > 1e-8) == expect_grad, (st, gnorm)


def test_trunk_features_matches_generator_subtree():
    """TrunkFeatures' param tree is the exact conv1+trunk_i subtree of the
    Generator, so frozen stage-1 checkpoints drop in directly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real_esrgan_tpu.models import (
        Generator, TrunkFeatures, trunk_feature_params,
    )

    gen = Generator(upscale_factor=4, num_rrdb=3, channels=16, growth=8)
    g_params = gen.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 16, 16, 3)))["params"]

    taps = (0, 1, 2)
    feat = TrunkFeatures(taps=taps, upscale_factor=4, channels=16, growth=8)
    f_params = trunk_feature_params(g_params, taps)

    # structural match: TrunkFeatures init produces the same tree
    own = feat.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)))["params"]
    assert jax.tree_util.tree_structure(own) == \
        jax.tree_util.tree_structure(f_params)

    x = jnp.asarray(np.random.default_rng(2).random((2, 24, 24, 3)), jnp.float32)
    feats = feat.apply({"params": f_params}, x)
    assert len(feats) == 3
    assert feats[0].shape == (2, 24, 24, 16)  # conv1 tap
    assert feats[2].shape == (2, 24, 24, 16)  # RRDB-2 tap
    # taps must be the real trained activations: deterministic + distinct
    feats2 = feat.apply({"params": f_params}, x)
    np.testing.assert_array_equal(np.asarray(feats[1]), np.asarray(feats2[1]))
    assert not np.allclose(np.asarray(feats[0]), np.asarray(feats[1]))

    try:
        trunk_feature_params(g_params, (0, 1, 2, 3, 4))
    except KeyError as e:
        assert "trunk_3" in str(e)
    else:
        raise AssertionError("missing trunk layers must raise")
