"""Halo-exchange spatial sharding: sharded conv == unsharded conv."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ir_ads_tpu.parallel.halo import halo_exchange, spatial_shard_apply
from ir_ads_tpu.parallel.mesh import make_mesh
from tests.conftest import requires_devices


@requires_devices(8)
def test_halo_exchange_rows():
    mesh = make_mesh(data=2, space=4)
    x = jnp.arange(16.0).reshape(16, 1, 1)  # H=16 over 4 shards of 4

    def local(xl):
        return halo_exchange(xl, halo=2)

    out = jax.shard_map(
        local, mesh=mesh, in_specs=P("space"), out_specs=P("space")
    )(x)
    out = np.asarray(out).reshape(4, 8)  # 4 shards x (2+4+2)
    # shard 1 holds rows 4..7; halo above = rows 2,3; below = rows 8,9
    np.testing.assert_array_equal(out[1], [2, 3, 4, 5, 6, 7, 8, 9])
    # boundary shards zero-padded
    np.testing.assert_array_equal(out[0][:2], [0, 0])
    np.testing.assert_array_equal(out[3][-2:], [0, 0])


@requires_devices(8)
def test_spatially_sharded_conv_matches_unsharded():
    mesh = make_mesh(data=2, space=4)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(5, 5, 3, 4).astype(np.float32))

    def conv(t):  # same-padding 5x5 conv, receptive radius 2 <= halo
        return jax.lax.conv_general_dilated(
            t, w, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ref = conv(x)
    sharded = spatial_shard_apply(conv, mesh, halo=2)
    out = sharded(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
