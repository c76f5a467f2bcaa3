"""Loss tests vs hand-rolled references / torch-CPU golden values
(modeled on reference tests/test_loss_functions.py and
test_loss_weighting.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from nicr_mtsa_tpu.losses import (
    CosineEmbeddingLoss,
    CrossEntropyLossSemantic,
    L1Loss,
    MSELoss,
    VonMisesLossBiternion,
)
from nicr_mtsa_tpu.weighting import (
    DynamicWeightAverage,
    FixedLossWeighting,
    RandomLossWeighting,
)

torch = pytest.importorskip('torch')


def _np_logits(shape, seed=0):
    return np.random.default_rng(seed).normal(size=shape).astype(np.float32)


def test_ce_matches_torch():
    B, H, W, C = 2, 8, 10, 5
    logits = _np_logits((B, H, W, C))
    target = np.random.default_rng(1).integers(0, C + 1, (B, H, W))

    loss = CrossEntropyLossSemantic()
    (l, n), = loss([jnp.asarray(logits)], [jnp.asarray(target)])

    t_logits = torch.tensor(logits).permute(0, 3, 1, 2)
    t_target = torch.tensor(target).long() - 1
    t_loss = torch.nn.CrossEntropyLoss(reduction='sum', ignore_index=-1)(
        t_logits, t_target)
    assert float(l) == pytest.approx(float(t_loss), rel=1e-5)
    assert int(n) == int((target > 0).sum())


def test_ce_weighted_matches_torch():
    B, H, W, C = 2, 6, 7, 4
    logits = _np_logits((B, H, W, C), seed=2)
    target = np.random.default_rng(3).integers(0, C + 1, (B, H, W))
    weights = np.array([0.5, 2.0, 1.0, 3.0], np.float32)

    loss = CrossEntropyLossSemantic(weights=weights)
    (l, n), = loss([jnp.asarray(logits)], [jnp.asarray(target)])

    t_loss = torch.nn.CrossEntropyLoss(
        weight=torch.tensor(weights), reduction='sum', ignore_index=-1)(
        torch.tensor(logits).permute(0, 3, 1, 2),
        torch.tensor(target).long() - 1)
    assert float(l) == pytest.approx(float(t_loss), rel=1e-5)


def test_ce_label_smoothing_matches_torch():
    B, H, W, C = 1, 5, 5, 6
    logits = _np_logits((B, H, W, C), seed=4)
    target = np.random.default_rng(5).integers(1, C + 1, (B, H, W))

    loss = CrossEntropyLossSemantic(label_smoothing=0.1)
    (l, _), = loss([jnp.asarray(logits)], [jnp.asarray(target)])
    t_loss = torch.nn.CrossEntropyLoss(
        reduction='sum', ignore_index=-1, label_smoothing=0.1)(
        torch.tensor(logits).permute(0, 3, 1, 2),
        torch.tensor(target).long() - 1)
    assert float(l) == pytest.approx(float(t_loss), rel=1e-5)


def test_l1_and_mse_channel_mean_then_sum():
    x = _np_logits((2, 4, 4, 3), seed=6)
    y = _np_logits((2, 4, 4, 3), seed=7)

    (l1, n1), = L1Loss()([jnp.asarray(x)], [jnp.asarray(y)])
    assert float(l1) == pytest.approx(
        float(np.abs(x - y).mean(axis=-1).sum()), rel=1e-5)
    assert int(n1) == 2 * 4 * 4

    (l2, n2), = MSELoss()([jnp.asarray(x)], [jnp.asarray(y)])
    assert float(l2) == pytest.approx(
        float(((x - y) ** 2).mean(axis=-1).sum()), rel=1e-5)


def test_vonmises():
    angles_pred = np.array([0.0, 1.0, 2.0])
    angles_tgt = np.array([0.0, 1.5, 2.0])
    bt = lambda a: np.stack([np.cos(a), np.sin(a)], axis=-1)

    (l, n), = VonMisesLossBiternion(kappa=1.0)(
        [jnp.asarray(bt(angles_pred), jnp.float32)],
        [jnp.asarray(bt(angles_tgt), jnp.float32)])
    expected = np.sum(1 - np.exp(np.cos(angles_pred - angles_tgt) - 1))
    assert float(l) == pytest.approx(float(expected), rel=1e-5)
    assert int(n) == 3

    # identical angles -> zero loss
    (l0, _), = VonMisesLossBiternion()(
        [jnp.asarray(bt(angles_pred), jnp.float32)],
        [jnp.asarray(bt(angles_pred), jnp.float32)])
    assert float(l0) == pytest.approx(0.0, abs=1e-6)

    # 2d-input requirement
    with pytest.raises(ValueError):
        VonMisesLossBiternion()(
            [jnp.zeros((2, 3, 2))], [jnp.zeros((2, 3, 2))])


def test_cosine_embedding_matches_torch():
    x = _np_logits((8, 16), seed=8)
    y = _np_logits((8, 16), seed=9)
    (l, n), = CosineEmbeddingLoss()([jnp.asarray(x)], [jnp.asarray(y)])
    t = torch.nn.CosineEmbeddingLoss(reduction='none')(
        torch.tensor(x), torch.tensor(y), torch.ones(8))
    assert float(l) == pytest.approx(float(t.sum()), rel=1e-5)


def test_multi_scale_protocol():
    x = [_np_logits((1, 8, 8, 3)), _np_logits((1, 4, 4, 3))]
    y = [_np_logits((1, 8, 8, 3), 1), _np_logits((1, 4, 4, 3), 1)]
    out = L1Loss()([jnp.asarray(a) for a in x], [jnp.asarray(a) for a in y])
    assert len(out) == 2
    assert int(out[0][1]) == 64 and int(out[1][1]) == 16


def test_fixed_loss_weighting():
    lw = FixedLossWeighting({'a': 2.0, 'b': 0.5})
    total = lw.reduce_losses({'a': jnp.asarray(1.0), 'b': jnp.asarray(4.0)},
                             batch_idx=0)
    assert float(total) == pytest.approx(4.0)


def test_dwa_weighting():
    lw = DynamicWeightAverage(('a', 'b'), temperature=2.0)
    # epoch 0 and 1: default weights
    for epoch, (la, lb) in enumerate([(4.0, 1.0), (2.0, 1.0)]):
        for batch_idx in range(3):
            total = lw.reduce_losses(
                {'a': jnp.asarray(la), 'b': jnp.asarray(lb)}, batch_idx)
        assert lw.weights == {'a': 1.0, 'b': 1.0}

    # epoch 2: ratios a: 2/4=0.5, b: 1/1=1 -> weight(a) < weight(b)
    lw.reduce_losses({'a': jnp.asarray(1.0), 'b': jnp.asarray(1.0)}, 0)
    assert lw.weights['a'] < lw.weights['b']
    assert sum(lw.weights.values()) == pytest.approx(2.0)

    # state roundtrip
    state = lw.state_dict()
    lw2 = DynamicWeightAverage(('a', 'b'))
    lw2.load_state_dict(state)
    assert lw2.weights == lw.weights


def test_rlw_weighting():
    lw = RandomLossWeighting(('a', 'b', 'c'), seed=0)
    w1 = dict(lw.weights)
    lw.reduce_losses({'a': jnp.asarray(1.0), 'b': jnp.asarray(1.0),
                      'c': jnp.asarray(1.0)}, 0)
    w2 = dict(lw.weights)
    assert w1 != w2
    assert sum(w2.values()) == pytest.approx(1.0)
