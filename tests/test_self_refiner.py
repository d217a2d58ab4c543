"""Self-refiner tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.self_refiner import parse_refiner_plan, refine_step


def test_parse_plan():
    assert parse_refiner_plan("") == {}
    assert parse_refiner_plan("0-2:3") == {0: 3, 1: 3, 2: 3}
    assert parse_refiner_plan("5:2, 8-9:1") == {5: 2, 8: 1, 9: 1}
    with pytest.raises(ValueError):
        parse_refiner_plan("bogus")


def test_refine_step_consistent_model_is_stable():
    """If the model is exactly consistent (constant velocity field), all
    refinement attempts agree and the result equals the plain step."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
    v_const = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
    # exactly-consistent linear model: v(x) = (x - x0_true)/sigma with x0
    # implied by the first eval -> constant v reproduces the same x0 hat
    sigma, sigma_next = 0.8, 0.6

    def forward(z):
        # flow-matching consistent: x0 = z - sigma*v_const for any z on the
        # path means v must vary; use v(z) = (z - x0_true)/sigma
        x0_true = x - sigma * v_const
        return (z - x0_true) / sigma

    plain = x + (sigma_next - sigma) * forward(x)
    refined = refine_step(forward, x, 800.0, sigma, sigma_next, m_steps=4,
                          key=jax.random.key(0), ths_uncertainty=1e-6)
    np.testing.assert_allclose(np.asarray(refined), np.asarray(plain),
                               rtol=1e-4, atol=1e-4)


def test_refine_step_changes_inconsistent_model():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 8)), jnp.float32)
    calls = []

    def forward(z):
        calls.append(1)
        # inconsistent: velocity depends nonlinearly on input
        return jnp.tanh(z) * 0.5

    plain = x + (0.5 - 0.9) * forward(x)
    refined = refine_step(forward, x, 900.0, 0.9, 0.5, m_steps=3,
                          key=jax.random.key(1), ths_uncertainty=0.0)
    assert np.abs(np.asarray(refined) - np.asarray(plain)).max() > 1e-5
    assert np.isfinite(np.asarray(refined)).all()
