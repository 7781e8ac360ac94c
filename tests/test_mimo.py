import numpy as np
import pytest

from srsran_tpu.phy import mimo


def crandn(rng, shape, scale=1.0):
    return ((rng.standard_normal(shape) + 1j * rng.standard_normal(shape)) * scale).astype(
        np.complex64
    )


def test_layermap_roundtrip_1cw():
    rng = np.random.default_rng(0)
    for nl in (1, 2, 4):
        cw = crandn(rng, (3, 8 * nl))
        layers = np.asarray(mimo.layermap([cw], nl))
        assert layers.shape == (3, nl, 8)
        back = mimo.layerdemap(layers, 1)
        np.testing.assert_allclose(np.asarray(back[0]), cw)


def test_layermap_roundtrip_2cw():
    rng = np.random.default_rng(1)
    for nl, split in ((2, (1, 1)), (3, (1, 2)), (4, (2, 2))):
        cws = [crandn(rng, (12 * s,)) for s in split]
        layers = np.asarray(mimo.layermap(cws, nl))
        assert layers.shape == (nl, 12)
        back = mimo.layerdemap(layers, 2)
        for b, cw in zip(back, cws):
            np.testing.assert_allclose(np.asarray(b), cw)


def test_layermap_interleaving():
    """Layer mapping is symbol-interleaved: x[0]→l0, x[1]→l1, ..."""
    cw = np.arange(8).astype(np.complex64)
    layers = np.asarray(mimo.layermap([cw], 2))
    np.testing.assert_allclose(layers[0], [0, 2, 4, 6])
    np.testing.assert_allclose(layers[1], [1, 3, 5, 7])


def test_sfbc_roundtrip():
    rng = np.random.default_rng(2)
    m, nrx = 120, 2
    x = crandn(rng, (m,))
    ports = np.asarray(mimo.precode_diversity2(x))  # (2, m)
    assert ports.shape == (2, m)
    # per-RE-pair-constant channel
    h = crandn(rng, (nrx, 2, m // 2))
    h = np.repeat(h, 2, axis=-1)
    y = np.einsum("rpm,pm->rm", h, ports)
    xh, csi = mimo.predecode_diversity2(y, h)
    np.testing.assert_allclose(np.asarray(xh), x, atol=1e-4)
    assert np.asarray(csi).shape == (m,)


def test_sfbc_power():
    rng = np.random.default_rng(3)
    x = crandn(rng, (1000,))
    ports = np.asarray(mimo.precode_diversity2(x))
    # total tx power across ports equals symbol power
    np.testing.assert_allclose(
        np.mean(np.sum(np.abs(ports) ** 2, axis=0)), np.mean(np.abs(x) ** 2), rtol=1e-3
    )


def test_mrc_single():
    rng = np.random.default_rng(4)
    m, nrx = 64, 2
    x = crandn(rng, (m,))
    h = crandn(rng, (nrx, m))
    y = h * x[None, :]
    xh, csi = mimo.predecode_single_mrc(y, h)
    np.testing.assert_allclose(np.asarray(xh), x, atol=1e-4)


@pytest.mark.parametrize("noise", [0.0, 0.01])
def test_zf_mmse_2layer(noise):
    rng = np.random.default_rng(5)
    m, nrx = 48, 2
    layers = crandn(rng, (2, m))
    h = crandn(rng, (nrx, 2, m))
    y = np.einsum("rlm,lm->rm", h, layers)
    xh, csi = mimo.predecode_zf_mmse(y, h, nof_layers=2, noise_est=noise)
    assert np.asarray(xh).shape == (2, m)
    if noise == 0.0:
        np.testing.assert_allclose(np.asarray(xh), layers, atol=1e-3)
    else:
        # MMSE with regularization is slightly biased; check MSE is small
        mse = np.mean(np.abs(np.asarray(xh) - layers) ** 2)
        assert mse < 0.05, mse


def test_spatialmux_pmi_roundtrip():
    rng = np.random.default_rng(6)
    m, nrx = 40, 2
    for pmi in (0, 1, 2):
        layers = crandn(rng, (2, m))
        ports = np.asarray(mimo.precode_spatialmux(layers, pmi))
        h = crandn(rng, (nrx, 2, m))
        y = np.einsum("rpm,pm->rm", h, ports)
        xh, _ = mimo.predecode_zf_mmse(y, h, nof_layers=2, pmi=pmi)
        np.testing.assert_allclose(np.asarray(xh), layers, atol=1e-3)


def test_spatialmux_1layer_pmi():
    rng = np.random.default_rng(7)
    m, nrx = 40, 2
    for pmi in range(4):
        x = crandn(rng, (1, m))
        ports = np.asarray(mimo.precode_spatialmux(x, pmi))
        assert ports.shape == (2, m)
        h = crandn(rng, (nrx, 2, m))
        y = np.einsum("rpm,pm->rm", h, ports)
        xh, _ = mimo.predecode_zf_mmse(y, h, nof_layers=1, pmi=pmi)
        assert np.asarray(xh).shape == (1, m)
        np.testing.assert_allclose(np.asarray(xh)[0], x[0], atol=1e-3)

def test_pmi_selection_picks_matched_precoder():
    """PMI selection prefers the codebook entry aligned with the channel."""
    rng = np.random.default_rng(11)
    m = 100
    # channel strongly aligned with pmi=1 vector [1,-1]/sqrt(2) (1 layer)
    h = np.zeros((1, 2, m), np.complex64)
    h[0, 0] = 1.0
    h[0, 1] = -1.0
    best, cap, cond = mimo.select_pmi(h, nof_layers=1)
    assert int(np.asarray(best)) == 1
    # orthogonal-column channel → pmi 0 best for 2 layers, low cond number
    h2 = np.zeros((2, 2, m), np.complex64)
    h2[0, 0] = 1.0
    h2[1, 1] = 1.0
    best2, cap2, cond2 = mimo.select_pmi(h2, nof_layers=2)
    assert float(np.asarray(cond2)) < 1.0


def test_diversity4_roundtrip():
    """4-port SFBC-FSTD: encode on 4 ports, mix through a 1x4 channel,
    Alamouti-decode both pairs."""
    rng = np.random.default_rng(6)
    m = 64
    x = ((rng.integers(0, 2, m) * 2 - 1) + 1j * (rng.integers(0, 2, m) * 2 - 1)).astype(np.complex64) / np.sqrt(2)
    ports = np.asarray(mimo.precode_diversity4(x))  # (4, m)
    h = (rng.standard_normal(4) + 1j * rng.standard_normal(4)).astype(np.complex64)
    y = np.einsum("p,pm->m", h, ports)[None, :]  # (1, m)
    hfull = np.broadcast_to(h[None, :, None], (1, 4, m)).astype(np.complex64)
    xh, csi = mimo.predecode_diversity4(y, hfull)
    np.testing.assert_allclose(np.asarray(xh), x, atol=1e-4)
