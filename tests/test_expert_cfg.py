"""Expert PHY tuning plane (the reference's [expert] section,
ue.conf.example:318-385) — parse + wiring into the UE stack."""

import numpy as np

from srsran_tpu.apps.full_stack import UeStack
from srsran_tpu.phy.common import Cell
from srsran_tpu.runtime.config import ExpertPhyConfig, load_config
from srsran_tpu.stack.nas_ue import Usim

IMSI = "001010123456789"
KEY = bytes.fromhex("00112233445566778899aabbccddeeff")


def _usim():
    return Usim(IMSI, KEY, bytes(16))


def test_expert_section_parses(tmp_path):
    ini = tmp_path / "ue.conf"
    ini.write_text(
        "[expert]\n"
        "cqi_fixed = 10\n"
        "cqi_max = 12\n"
        "snr_to_cqi_offset = -2.5\n"
        "pdsch_max_its = 3\n"
        "pdsch_8bit_decoder = true\n"
        "force_ul_amplitude = 0.5\n"
        "equalizer_mode = zf\n")
    cfg = load_config(str(ini))
    assert cfg.expert.cqi_fixed == 10
    assert cfg.expert.cqi_max == 12
    assert cfg.expert.snr_to_cqi_offset == -2.5
    assert cfg.expert.pdsch_max_its == 3
    assert cfg.expert.pdsch_8bit_decoder is True
    assert cfg.expert.force_ul_amplitude == 0.5
    assert cfg.expert.equalizer_mode == "zf"
    # CLI override beats the file (boost::program_options layering)
    cfg2 = load_config(str(ini), overrides=["expert.cqi_fixed=7"])
    assert cfg2.expert.cqi_fixed == 7


def test_cqi_shaping():
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    ue = UeStack(cell, _usim(),
                 expert=ExpertPhyConfig(cqi_fixed=9, cqi_max=11))
    assert ue._report_cqi() == 9
    ue.expert.cqi_fixed = 14  # clamped by cqi_max
    assert ue._report_cqi() == 11
    ue.expert.cqi_fixed = -1
    ue._dl_snr_db = 30.0      # high SNR → CQI 15 unclamped
    assert ue._report_cqi() == 11
    ue.expert.cqi_max = 15
    hi = ue._report_cqi()
    ue.expert.snr_to_cqi_offset = -12.0
    assert ue._report_cqi() < hi


def test_snr_ema_and_decoder_knobs():
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    ue = UeStack(cell, _usim(), windowed_phy=True, phy_window=4,
                 expert=ExpertPhyConfig(pdsch_max_its=3,
                                        pdsch_8bit_decoder=True,
                                        snr_ema_coeff=0.5))
    assert ue._win_dl.engine.max_iterations == 3
    assert ue._win_dl.engine.ingest == "int8"
    ue2 = UeStack(cell, _usim(), windowed_phy=True, phy_window=4)
    assert ue2._win_dl.engine.ingest == "int16"  # reference default


def test_force_ul_amplitude(monkeypatch):
    cell = Cell(nof_prb=6, nof_ports=1, id=1)
    ue = UeStack(cell, _usim(),
                 expert=ExpertPhyConfig(force_ul_amplitude=0.25))
    raw = (0.01 * (np.arange(cell.sf_len) % 7 - 3)).astype(np.complex64)
    monkeypatch.setattr(ue, "_build_ul", lambda tti, sf: raw.copy())
    ul = ue.run_tti(np.zeros(cell.sf_len, np.complex64))
    assert ul is not None
    np.testing.assert_allclose(float(np.max(np.abs(ul))), 0.25, rtol=1e-5)
