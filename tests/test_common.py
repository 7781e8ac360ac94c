import pytest

from srsran_tpu.phy import common as C


def test_symbol_sz_standard():
    assert [C.symbol_sz(p) for p in (6, 15, 25, 50, 75, 100)] == [
        128, 256, 512, 1024, 1536, 2048,
    ]


def test_symbol_sz_reduced():
    assert [C.symbol_sz(p, False) for p in (6, 15, 25, 50, 75, 100)] == [
        128, 256, 384, 768, 1024, 1536,
    ]


def test_cp_lengths_128():
    cell = C.Cell(nof_prb=6)
    # 2048-scale CP 160/144 → at N=128: 10 and 9
    assert cell.cp_lengths_slot() == (10, 9, 9, 9, 9, 9, 9)
    assert sum(cell.cp_lengths_slot()) + 7 * 128 == cell.slot_len
    assert cell.sf_len == 1920  # 1.92 Msps * 1 ms


def test_cp_lengths_2048():
    cell = C.Cell(nof_prb=100)
    assert cell.cp_lengths_slot() == (160, 144, 144, 144, 144, 144, 144)
    assert cell.sf_len == 30720


def test_ext_cp():
    cell = C.Cell(nof_prb=6, cp=C.CP.EXT)
    assert cell.nsymb_per_slot == 6
    assert cell.cp_lengths_slot() == (32,) * 6
    assert sum(cell.cp_lengths_slot()) + 6 * 128 == cell.slot_len


def test_cell_validation():
    with pytest.raises(ValueError):
        C.Cell(nof_prb=200)
    with pytest.raises(ValueError):
        C.Cell(id=504)


def test_crs_symbols():
    # normal CP, 2 ports: symbols 0 and 4 of each slot
    has = [C.symbol_has_ref(l, C.CP.NORM, 2) for l in range(7)]
    assert has == [True, False, False, False, True, False, False]
    has4 = [C.symbol_has_ref(l, C.CP.NORM, 4) for l in range(7)]
    assert has4 == [True, True, False, False, True, False, False]
