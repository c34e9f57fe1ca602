"""Pallas fused dropout: statistics, determinism, and VJP mask identity
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from fitgnn_tpu.ops.pallas.dropout import fused_dropout, seed_from_rng


class TestFusedDropout:
    def test_keep_rate_and_scale(self):
        x = jnp.ones((2048, 128), dtype=jnp.float32)
        seed = jnp.asarray([123], dtype=jnp.int32)
        out = np.asarray(fused_dropout(x, seed, 0.5))
        kept = out != 0
        assert abs(kept.mean() - 0.5) < 0.02
        np.testing.assert_allclose(out[kept], 2.0, rtol=1e-6)

    def test_deterministic_per_seed(self):
        x = jnp.ones((512, 128), dtype=jnp.float32)
        s1 = jnp.asarray([7], dtype=jnp.int32)
        s2 = jnp.asarray([8], dtype=jnp.int32)
        a = np.asarray(fused_dropout(x, s1, 0.5))
        b = np.asarray(fused_dropout(x, s1, 0.5))
        c = np.asarray(fused_dropout(x, s2, 0.5))
        np.testing.assert_array_equal(a, b)
        assert (a != c).any()

    def test_grad_uses_same_mask(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((512, 128)), dtype=jnp.float32)
        seed = jnp.asarray([42], dtype=jnp.int32)

        out, vjp = jax.vjp(lambda xx: fused_dropout(xx, seed, 0.5), x)
        g = jnp.ones_like(out)
        (dx,) = vjp(g)
        mask = np.asarray(out) != 0
        np.testing.assert_array_equal(np.asarray(dx) != 0, mask)
        np.testing.assert_allclose(np.asarray(dx)[mask], 2.0, rtol=1e-6)

    def test_model_path_runs(self):
        from fitgnn_tpu.data.synthetic import sbm_graph
        from fitgnn_tpu.graph import build_graph
        from fitgnn_tpu.models import NodeModel
        x, s, r, y = sbm_graph(num_nodes=200, num_classes=3,
                               num_features=8, seed=0)
        g = build_graph(x, s, r, y=y)
        m = NodeModel(layer_name="GCNConv", hidden=16, num_layers=2,
                      out_dim=3, fused_dropout=True)
        p = m.init(jax.random.PRNGKey(0), g.x, g)
        out = m.apply(p, g.x, g, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(np.asarray(out)).all()

    def test_seed_from_rng(self):
        s1 = seed_from_rng(jax.random.PRNGKey(0))
        s2 = seed_from_rng(jax.random.PRNGKey(1))
        assert s1.shape == (1,) and int(s1[0]) != int(s2[0])


class TestBitDropout:
    def test_exact_bernoulli_half(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from fitgnn_tpu.models.models import _bit_dropout_half
        x = jnp.ones((256, 128), jnp.float32)
        out = np.asarray(_bit_dropout_half(x, jax.random.PRNGKey(0)))
        vals = np.unique(out)
        assert set(vals.tolist()) <= {0.0, 2.0}
        keep = (out > 0).mean()
        assert 0.45 < keep < 0.55
        # different rng -> different mask; same rng -> same mask
        out2 = np.asarray(_bit_dropout_half(x, jax.random.PRNGKey(0)))
        np.testing.assert_array_equal(out, out2)
        out3 = np.asarray(_bit_dropout_half(x, jax.random.PRNGKey(1)))
        assert (out != out3).any()

    def test_bits_independent_across_lanes(self):
        # adjacent elements come from different bits of one word — their
        # correlation must be near zero
        import jax
        import numpy as np
        from fitgnn_tpu.models.models import _bit_dropout_half
        import jax.numpy as jnp
        x = jnp.ones((2048, 64), jnp.float32)
        out = np.asarray(_bit_dropout_half(x, jax.random.PRNGKey(2))) / 2.0
        a, b = out[:, 0], out[:, 1]
        corr = np.corrcoef(a, b)[0, 1]
        assert abs(corr) < 0.05

    def test_model_path(self):
        import jax
        import numpy as np
        from fitgnn_tpu.data.synthetic import sbm_graph
        from fitgnn_tpu.graph import build_graph
        from fitgnn_tpu.models import NodeModel
        x, s, r, y = sbm_graph(num_nodes=200, num_classes=3,
                               num_features=32, seed=0)
        g = build_graph(x, s, r, y=y)
        m = NodeModel(layer_name="GCNConv", hidden=32, num_layers=2,
                      out_dim=3, bit_dropout=True)
        params = m.init(jax.random.PRNGKey(0), g.x, g)
        out = m.apply(params, g.x, g, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.isfinite(np.asarray(out)).all()
