"""Adaptive sampling × tile sharding (render/adaptive.py, round 4).

Contracts under test (on the virtual 8-device CPU mesh):
* a sharded bootstrap is bitwise the unsharded bootstrap — equal
  per-block schedules give equal per-pixel sums (the contiguous
  per-pixel sample streams are device-placement independent);
* a forced post-bootstrap schedule folds bitwise identically whether the
  blocks are rendered by their owning devices or by the single-device
  session;
* auto rounds respect stripe ownership: each device's stripe gains
  exactly n_sel_local rounds per step, all within the stripe;
* sharded sessions checkpoint/resume exactly, and the provenance refuses
  a device-count mismatch (stripe ownership depends on it).
"""

import jax
import numpy as np
import pytest

from myraytracer_tpu.config import RenderConfig
from myraytracer_tpu.parallel.sharding import default_mesh
from myraytracer_tpu.render.adaptive import AdaptiveSession
from myraytracer_tpu.scene import presets

W, H, SPP, DEPTH = 256, 128, 2, 4  # 4x4 grid of 64x32 blocks


def _cfg(**kw):
    base = dict(
        width=W, height=H, samples_per_frame=SPP, ray_depth=DEPTH,
        backend="jnp", seed=5,
        frame_batch=1,  # pin F: auto picks per-backend (1 jnp, knee pallas)
    )
    base.update(kw)
    return RenderConfig(**base)


@pytest.fixture(scope="module")
def world():
    return presets.three_sphere_scene()


@pytest.fixture(scope="module")
def pair(world):
    """(unsharded, sharded) sessions bootstrapped on the same schedule."""
    a = AdaptiveSession(world, _cfg(), n_sel=8)
    b = AdaptiveSession(world, _cfg(shard="tiles"), n_sel=8)
    a.bootstrap()
    b.bootstrap()
    return a, b


def test_geometry_and_stripes(pair):
    a, b = pair
    assert a.n_blocks == b.n_blocks == 16
    assert b.ndev == 8 and b.local_nb == 2 and b.n_sel_local == 1
    assert b.n_sel == 8 and b.sel_real == 8


def test_sharded_bootstrap_bitwise_equals_unsharded(pair):
    a, b = pair
    np.testing.assert_array_equal(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer)
    )
    np.testing.assert_array_equal(a.spp_map, b.spp_map)
    assert a.samples_spent == b.samples_spent


def test_forced_schedule_bitwise(world):
    """Blocks 1 and 9 rendered one extra round: by their owning devices
    (d0 owns {0,1}, d4 owns {8,9}) vs by the single-device session —
    identical per-pixel sums, bitwise."""
    import jax.numpy as jnp

    a = AdaptiveSession(world, _cfg(), n_sel=2)
    b = AdaptiveSession(world, _cfg(shard="tiles"), n_sel=8)
    a.bootstrap()
    b.bootstrap()
    a._state, _ = a._round_ids(
        a.scene, a.key, a._state, jnp.asarray([1, 9], jnp.uint32)
    )
    ids = np.full((b.ndev, b.n_sel_local), b.sentinel, np.int64)
    ids[0, 0], ids[4, 0] = 1, 9
    b._state, _ = b._round_ids(
        b.scene, b.key, b._state, jnp.asarray(ids, jnp.uint32)
    )
    np.testing.assert_array_equal(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer)
    )
    # The two rendered blocks carry one extra round in both sessions.
    nb_a = np.asarray(a._state[3][: a.n_blocks])
    nb_b = np.asarray(b._state[3])[:, : b.local_nb].reshape(-1)[: b.n_blocks]
    np.testing.assert_array_equal(nb_a, nb_b)
    assert nb_a[1] == nb_a[9] == 3 * SPP and nb_a[0] == 2 * SPP


def test_auto_round_respects_stripe_ownership(pair):
    _, b = pair
    import copy

    r_before = np.asarray(b._state[4])[:, : b.local_nb].copy()
    spent = b.samples_spent
    b.step()
    r_after = np.asarray(b._state[4])[:, : b.local_nb]
    gained = r_after - r_before
    # Each device scheduled exactly n_sel_local rounds within its stripe.
    np.testing.assert_array_equal(gained.sum(axis=1),
                                  np.full(b.ndev, b.n_sel_local))
    assert (gained >= 0).all()
    assert b.samples_spent - spent == (
        b.sel_real * b.block_h * b.block_w * SPP * b.windows
    )


def test_sharded_selects_stripe_top_score(world):
    """One auto round after the bootstrap: in every stripe, the block
    that gained a round is the stripe's top-scoring block (recomputed on
    host; skipped per-stripe when the top two scores are within float
    noise of each other)."""
    b = AdaptiveSession(world, _cfg(shard="tiles"), n_sel=8)
    b.bootstrap()
    s1 = np.asarray(b._state[1], np.float64)
    s2 = np.asarray(b._state[2], np.float64)
    r_b = np.asarray(b._state[4], np.float64)
    r_before = np.asarray(b._state[4])[:, : b.local_nb].copy()
    b.step()
    gained = np.asarray(b._state[4])[:, : b.local_nb] - r_before
    for d in range(b.ndev):
        r = r_b[d, : b.local_nb, None, None]
        var = np.maximum((s2[d, : b.local_nb] - s1[d, : b.local_nb] ** 2 / r)
                         / np.maximum(r - 1.0, 1.0), 0.0)
        score = var.mean(axis=(1, 2)) / (r[:, 0, 0] * (r[:, 0, 0] + 1.0))
        order = np.argsort(-score, kind="stable")
        if len(order) > 1 and not np.isclose(
            score[order[0]], score[order[1]], rtol=1e-4, atol=1e-12
        ):
            assert gained[d, order[0]] == 1, (d, score, gained[d])


def test_sharded_checkpoint_resume_exact(world, tmp_path):
    cfg = _cfg(shard="tiles")
    a = AdaptiveSession(world, cfg, n_sel=8)
    a.bootstrap()
    for _ in range(3):
        a.step()

    b = AdaptiveSession(world, cfg, n_sel=8)
    b.bootstrap()
    b.step()
    path = tmp_path / "s.npz"
    b.save_checkpoint(path)
    c = AdaptiveSession(world, cfg, n_sel=8)
    c.load_checkpoint(path)
    assert c.bootstrapped
    for _ in range(2):
        c.step()
    for sa, sc in zip(a._state, c._state):
        np.testing.assert_array_equal(np.asarray(sa), np.asarray(sc))
    np.testing.assert_array_equal(
        np.asarray(a.framebuffer), np.asarray(c.framebuffer)
    )


def test_sharded_checkpoint_refuses_mesh_mismatch(world, tmp_path):
    cfg = _cfg(shard="tiles")
    a = AdaptiveSession(world, cfg, n_sel=8)
    a.bootstrap()
    path = tmp_path / "s.npz"
    a.save_checkpoint(path)
    # 4-device mesh: different stripe ownership — must refuse.
    mesh4 = default_mesh(jax.devices()[:4])
    b = AdaptiveSession(world, cfg, n_sel=8, mesh=mesh4)
    with pytest.raises(ValueError, match="ndev"):
        b.load_checkpoint(path)
    # An unsharded session must refuse a sharded checkpoint too.
    with pytest.raises(ValueError, match="shard"):
        AdaptiveSession(world, _cfg(), n_sel=8).load_checkpoint(path)


def test_rejects_sample_and_hybrid_shards(world):
    for mode in ("samples", "hybrid"):
        with pytest.raises(ValueError, match="tiles"):
            AdaptiveSession(world, _cfg(shard=mode))


@pytest.mark.slow
def test_sharded_pallas_interpret_matches_jnp(world):
    """The Pallas adaptive kernel under shard_map (interpret mode off-TPU)
    produces the jnp sharded session's framebuffer within the documented
    cross-compiler envelope."""
    a = AdaptiveSession(world, _cfg(shard="tiles"), n_sel=8)
    b = AdaptiveSession(
        world, _cfg(shard="tiles", backend="pallas"), n_sel=8,
        interpret=True,
    )
    for s in (a, b):
        s.bootstrap()
        s.step()
    # Cross-compiler envelope; the auto-round here folds three rounds of
    # sums, so the per-round 2e-6 envelope compounds slightly.
    np.testing.assert_allclose(
        np.asarray(a.framebuffer), np.asarray(b.framebuffer), atol=4e-6
    )
    np.testing.assert_array_equal(a.spp_map, b.spp_map)
