"""TS 36.331 RRC message schemas (UPER), hand-written on the per.py DSL.

Replaces the reference's generated `rrc_asn1.cc` (119 kLoC — SURVEY §2.2,
reference lib/src/asn1/rrc_asn1.cc) for the message subset the stack and
the conformance tests actually exercise: BCCH-BCH (MIB), BCCH-DL-SCH
(SIB1/SIB2...), DL-CCCH (connection setup/reject/re-establishment),
DL-DCCH (reconfiguration incl. handover, security mode command, release),
UL-CCCH / UL-DCCH (requests, complete messages, measurement reports) and
MCCH (MBSFNAreaConfiguration-r9).

Encodings are validated bit-exactly against the golden UPER vectors from
the reference's ASN.1 tests (lib/test/asn1/srslte_asn1_rrc_*.cc) in
tests/test_asn1_rrc.py.

Field names follow the reference's snake_case (cqi_pmi_cfg_idx, ...) so
parity with its test assertions is greppable.  Values are plain Python
data per per.py's value model.
"""

from .per import (
    BitStr,
    Bool,
    Choice,
    D,
    Enum,
    Int,
    M,
    Null,
    O,
    OctStr,
    Seq,
    SeqOf,
    c1_spares,
)

# --------------------------------------------------------------- helpers


def setup_release(setup_type):
    """The 36.331 `CHOICE {release NULL, setup ...}` pattern."""
    return Choice([("release", Null()), ("setup", setup_type)])


def explicit_default(explicit_type):
    """`CHOICE {explicitValue X, defaultValue NULL}` pattern."""
    return Choice([("explicit_value", explicit_type), ("default_value", Null())])


def crit_ext_c1(name, r8_type, n_spares):
    """criticalExtensions CHOICE{c1 CHOICE{<name>-r8, spares}, future}."""
    return Choice(
        [
            ("c1", c1_spares([(name + "_r8", r8_type)], n_spares)),
            ("crit_exts_future", Seq([])),
        ]
    )


# ------------------------------------------------------------- RLC-Config

T_POLL_RETX = Enum(
    [f"ms{v}" for v in range(5, 251, 5)] + [f"ms{v}" for v in range(300, 501, 50)]
    + [f"spare{i}" for i in range(9, 0, -1)]
)
assert len(T_POLL_RETX.names) == 64
POLL_PDU = Enum(["p4", "p8", "p16", "p32", "p64", "p128", "p256", "pinfinity"])
POLL_BYTE = Enum(
    ["kb25", "kb50", "kb75", "kb100", "kb125", "kb250", "kb375", "kb500",
     "kb750", "kb1000", "kb1250", "kb1500", "kb2000", "kb3000", "kbinfinity", "spare1"]
)
MAX_RETX_THRES = Enum(["t1", "t2", "t3", "t4", "t6", "t8", "t16", "t32"])
T_REORDERING = Enum(
    [f"ms{v}" for v in range(0, 101, 5)] + [f"ms{v}" for v in range(110, 201, 10)]
    + ["ms1600_v1310"]
)
assert len(T_REORDERING.names) == 32
T_STATUS_PROHIBIT = Enum(
    [f"ms{v}" for v in range(0, 251, 5)] + [f"ms{v}" for v in range(300, 501, 50)]
    + [f"spare{i}" for i in range(8, 0, -1)]
)
assert len(T_STATUS_PROHIBIT.names) == 64
SN_FIELD_LEN = Enum(["size5", "size10"])

UL_AM_RLC = Seq(
    [
        M("t_poll_retx", T_POLL_RETX),
        M("poll_pdu", POLL_PDU),
        M("poll_byte", POLL_BYTE),
        M("max_retx_thres", MAX_RETX_THRES),
    ]
)
DL_AM_RLC = Seq([M("t_reordering", T_REORDERING), M("t_status_prohibit", T_STATUS_PROHIBIT)])
UL_UM_RLC = Seq([M("sn_field_len", SN_FIELD_LEN)])
DL_UM_RLC = Seq([M("sn_field_len", SN_FIELD_LEN), M("t_reordering", T_REORDERING)])

RLC_CONFIG = Choice(
    [
        ("am", Seq([M("ul_am_rlc", UL_AM_RLC), M("dl_am_rlc", DL_AM_RLC)])),
        ("um_bi_dir", Seq([M("ul_um_rlc", UL_UM_RLC), M("dl_um_rlc", DL_UM_RLC)])),
        ("um_uni_dir_ul", Seq([M("ul_um_rlc", UL_UM_RLC)])),
        ("um_uni_dir_dl", Seq([M("dl_um_rlc", DL_UM_RLC)])),
    ],
    ext=True,
)

# --------------------------------------------------- LogicalChannelConfig

PRIORITISED_BIT_RATE = Enum(
    ["kbps0", "kbps8", "kbps16", "kbps32", "kbps64", "kbps128", "kbps256", "infinity",
     "kbps512_v1020", "kbps1024_v1020", "kbps2048_v1020", "spare5", "spare4", "spare3",
     "spare2", "spare1"]
)
BUCKET_SIZE_DUR = Enum(["ms50", "ms100", "ms150", "ms300", "ms500", "ms1000", "spare2", "spare1"])

LOGICAL_CHANNEL_CONFIG = Seq(
    [
        O(
            "ul_specific_params",
            Seq(
                [
                    M("prio", Int(1, 16)),
                    M("prioritised_bit_rate", PRIORITISED_BIT_RATE),
                    M("bucket_size_dur", BUCKET_SIZE_DUR),
                    O("lc_ch_group", Int(0, 3)),
                ]
            ),
        ),
    ],
    ext=True,
    ext_additions=[
        M("lc_ch_sr_mask_r9", Enum(["setup"])),
        M("lc_ch_sr_prohibit_r12", Bool()),
    ],
)

# -------------------------------------------------------------- PDCP-Config

DISCARD_TIMER = Enum(["ms50", "ms100", "ms150", "ms300", "ms500", "ms750", "ms1500", "infinity"])

ROHC_PROFILES = Seq(
    [
        M("profile0x0001", Bool()),
        M("profile0x0002", Bool()),
        M("profile0x0003", Bool()),
        M("profile0x0004", Bool()),
        M("profile0x0006", Bool()),
        M("profile0x0101", Bool()),
        M("profile0x0102", Bool()),
        M("profile0x0103", Bool()),
        M("profile0x0104", Bool()),
    ]
)

HEADER_COMPRESSION = Choice(
    [
        ("not_used", Null()),
        ("rohc", Seq([D("max_cid", Int(1, 16383), 15), M("profiles", ROHC_PROFILES)], ext=True)),
    ]
)

PDCP_CONFIG = Seq(
    [
        O("discard_timer", DISCARD_TIMER),
        O("rlc_am", Seq([M("status_report_required", Bool())])),
        O("rlc_um", Seq([M("pdcp_sn_size", Enum(["len7bits", "len12bits"]))])),
        M("hdr_compress", HEADER_COMPRESSION),
    ],
    ext=True,
    ext_additions=[
        M("rn_integrity_protection_r10", Enum(["enabled"])),
        M("pdcp_sn_size_v1130", Enum(["len15bits"])),
    ],
)

# ----------------------------------------------------------- MAC-MainConfig

MAX_HARQ_TX = Enum(
    ["n1", "n2", "n3", "n4", "n5", "n6", "n7", "n8", "n10", "n12", "n16", "n20",
     "n24", "n28", "spare2", "spare1"]
)
PERIODIC_BSR_TIMER = Enum(
    ["sf5", "sf10", "sf16", "sf20", "sf32", "sf40", "sf64", "sf80", "sf128",
     "sf160", "sf320", "sf640", "sf1280", "sf2560", "infinity", "spare1"]
)
RETX_BSR_TIMER = Enum(["sf320", "sf640", "sf1280", "sf2560", "sf5120", "sf10240", "spare2", "spare1"])
TIME_ALIGN_TIMER = Enum(["sf500", "sf750", "sf1280", "sf1920", "sf2560", "sf5120", "sf10240", "infinity"])

ON_DUR_TIMER = Enum(
    ["psf1", "psf2", "psf3", "psf4", "psf5", "psf6", "psf8", "psf10", "psf20",
     "psf30", "psf40", "psf50", "psf60", "psf80", "psf100", "psf200"]
)
DRX_INACTIVITY_TIMER = Enum(
    ["psf1", "psf2", "psf3", "psf4", "psf5", "psf6", "psf8", "psf10", "psf20",
     "psf30", "psf40", "psf50", "psf60", "psf80", "psf100", "psf200", "psf300",
     "psf500", "psf750", "psf1280", "psf1920", "psf2560", "psf0_v1020",
     "spare9", "spare8", "spare7", "spare6", "spare5", "spare4", "spare3",
     "spare2", "spare1"]
)
DRX_RETX_TIMER = Enum(["psf1", "psf2", "psf4", "psf6", "psf8", "psf16", "psf24", "psf33"])
SHORT_DRX_CYCLE = Enum(
    ["sf2", "sf5", "sf8", "sf10", "sf16", "sf20", "sf32", "sf40", "sf64",
     "sf80", "sf128", "sf160", "sf256", "sf320", "sf512", "sf640"]
)
LONG_DRX_CYCLE_START_OFFSET = Choice(
    [(f"sf{n}", Int(0, n - 1)) for n in (10, 20, 32, 40, 64, 80, 128, 160, 256, 320, 512, 640, 1024, 1280, 2048, 2560)]
)

DRX_CONFIG = setup_release(
    Seq(
        [
            M("on_dur_timer", ON_DUR_TIMER),
            M("drx_inactivity_timer", DRX_INACTIVITY_TIMER),
            M("drx_retx_timer", DRX_RETX_TIMER),
            M("long_drx_cycle_start_offset", LONG_DRX_CYCLE_START_OFFSET),
            O("short_drx", Seq([M("short_drx_cycle", SHORT_DRX_CYCLE), M("drx_short_cycle_timer", Int(1, 16))])),
        ]
    )
)

PHR_CONFIG = setup_release(
    Seq(
        [
            M("periodic_phr_timer", Enum(["sf10", "sf20", "sf50", "sf100", "sf200", "sf500", "sf1000", "infinity"])),
            M("prohibit_phr_timer", Enum(["sf0", "sf10", "sf20", "sf50", "sf100", "sf200", "sf500", "sf1000"])),
            M("dl_pathloss_change", Enum(["db1", "db3", "db6", "infinity"])),
        ]
    )
)

MAC_MAIN_CONFIG = Seq(
    [
        O(
            "ul_sch_cfg",
            Seq(
                [
                    O("max_harq_tx", MAX_HARQ_TX),
                    O("periodic_bsr_timer", PERIODIC_BSR_TIMER),
                    M("retx_bsr_timer", RETX_BSR_TIMER),
                    M("tti_bundling", Bool()),
                ]
            ),
        ),
        O("drx_cfg", DRX_CONFIG),
        M("time_align_timer_ded", TIME_ALIGN_TIMER),
        O("phr_cfg", PHR_CONFIG),
    ],
    ext=True,
    ext_additions=[
        M("sr_prohibit_timer_r9", Int(0, 7)),
    ],
)

# --------------------------------------------------------------- SPS-Config

SPS_INTERVAL = Enum(
    ["sf10", "sf20", "sf32", "sf40", "sf64", "sf80", "sf128", "sf160", "sf320",
     "sf640", "spare6", "spare5", "spare4", "spare3", "spare2", "spare1"]
)

SPS_CONFIG_DL = setup_release(
    Seq(
        [
            M("semi_persist_sched_interv_dl", SPS_INTERVAL),
            M("nof_conf_sps_processes", Int(1, 8)),
            M("n1_pucch_an_persistent_list", SeqOf(Int(0, 2047), 1, 4)),
        ],
        ext=True,
    )
)

SPS_CONFIG_UL = setup_release(
    Seq(
        [
            M("semi_persist_sched_interv_ul", SPS_INTERVAL),
            M("implicit_release_after", Enum(["e2", "e3", "e4", "e8"])),
            O(
                "p0_persistent",
                Seq([M("p0_nominal_pusch_persistent", Int(-126, 24)), M("p0_ue_pusch_persistent", Int(-8, 7))]),
            ),
            O("two_intervals_cfg", Enum(["true_value"])),
        ],
        ext=True,
    )
)

SPS_CONFIG = Seq(
    [
        O("semi_persist_sched_c_rnti", BitStr(16)),
        O("sps_cfg_dl", SPS_CONFIG_DL),
        O("sps_cfg_ul", SPS_CONFIG_UL),
    ]
)

# ------------------------------------------------- PhysicalConfigDedicated

PDSCH_CONFIG_DEDICATED = Seq(
    [M("p_a", Enum(["db_minus6", "db_minus4dot77", "db_minus3", "db_minus1dot77", "db0", "db1", "db2", "db3"]))]
)

PUCCH_CONFIG_DEDICATED = Seq(
    [
        M(
            "ack_nack_repeat",
            setup_release(
                Seq([M("repeat_factor", Enum(["n2", "n4", "n6", "spare1"])), M("n1_pucch_an_rep", Int(0, 2047))])
            ),
        ),
        O("tdd_ack_nack_feedback_mode", Enum(["bundling", "mux"])),
    ]
)

PUSCH_CONFIG_DEDICATED = Seq(
    [
        M("beta_offset_ack_idx", Int(0, 15)),
        M("beta_offset_ri_idx", Int(0, 15)),
        M("beta_offset_cqi_idx", Int(0, 15)),
    ]
)

FILTER_COEFFICIENT = Enum(
    ["fc0", "fc1", "fc2", "fc3", "fc4", "fc5", "fc6", "fc7", "fc8", "fc9",
     "fc11", "fc13", "fc15", "fc17", "fc19", "spare1"],
    ext=True,
)

UL_POWER_CONTROL_DEDICATED = Seq(
    [
        M("p0_ue_pusch", Int(-8, 7)),
        M("delta_mcs_enabled", Enum(["en0", "en1"])),
        M("accumulation_enabled", Bool()),
        M("p0_ue_pucch", Int(-8, 7)),
        M("psrs_offset", Int(0, 15)),
        D("filt_coef", FILTER_COEFFICIENT, "fc4"),
    ]
)

TPC_PDCCH_CONFIG = setup_release(
    Seq(
        [
            M("tpc_rnti", BitStr(16)),
            M("tpc_idx", Choice([("idx_of_format3", Int(1, 15)), ("idx_of_format3a", Int(1, 31))])),
        ]
    )
)

CQI_REPORT_PERIODIC = setup_release(
    Seq(
        [
            M("cqi_pucch_res_idx", Int(0, 1185)),
            M("cqi_pmi_cfg_idx", Int(0, 1023)),
            M(
                "cqi_format_ind_periodic",
                Choice([("wideband_cqi", Null()), ("subband_cqi", Seq([M("k", Int(1, 4))]))]),
            ),
            O("ri_cfg_idx", Int(0, 1023)),
            M("simul_ack_nack_and_cqi", Bool()),
        ]
    )
)

CQI_REPORT_CONFIG = Seq(
    [
        O(
            "cqi_report_mode_aperiodic",
            Enum(["rm12", "rm20", "rm22", "rm30", "rm31", "rm32_v1250", "rm10_v1310", "rm11_v1310"]),
        ),
        M("nom_pdsch_rs_epre_offset", Int(-1, 6)),
        O("cqi_report_periodic", CQI_REPORT_PERIODIC),
    ]
)

SRS_UL_CONFIG_DEDICATED = setup_release(
    Seq(
        [
            M("srs_bw", Enum(["bw0", "bw1", "bw2", "bw3"])),
            M("srs_hop_bw", Enum(["hbw0", "hbw1", "hbw2", "hbw3"])),
            M("freq_domain_position", Int(0, 23)),
            M("dur", Bool()),
            M("srs_cfg_idx", Int(0, 1023)),
            M("tx_comb", Int(0, 1)),
            M("cyclic_shift", Enum(["cs0", "cs1", "cs2", "cs3", "cs4", "cs5", "cs6", "cs7"])),
        ]
    )
)

ANTENNA_INFO_DEDICATED = Seq(
    [
        M("tx_mode", Enum(["tm1", "tm2", "tm3", "tm4", "tm5", "tm6", "tm7", "tm8_v920"])),
        O(
            "codebook_subset_restrict",
            Choice(
                [
                    ("n2_tx_ant_tm3", BitStr(2)),
                    ("n4_tx_ant_tm3", BitStr(4)),
                    ("n2_tx_ant_tm4", BitStr(6)),
                    ("n4_tx_ant_tm4", BitStr(64)),
                    ("n2_tx_ant_tm5", BitStr(4)),
                    ("n4_tx_ant_tm5", BitStr(16)),
                    ("n2_tx_ant_tm6", BitStr(4)),
                    ("n4_tx_ant_tm6", BitStr(16)),
                ]
            ),
        ),
        M("ue_tx_ant_sel", setup_release(Enum(["closed_loop", "open_loop"]))),
    ]
)

SCHEDULING_REQUEST_CONFIG = setup_release(
    Seq(
        [
            M("sr_pucch_res_idx", Int(0, 2047)),
            M("sr_cfg_idx", Int(0, 157)),
            M("dsr_trans_max", Enum(["n4", "n8", "n16", "n32", "n64", "spare3", "spare2", "spare1"])),
        ]
    )
)

PHYSICAL_CONFIG_DEDICATED = Seq(
    [
        O("pdsch_cfg_ded", PDSCH_CONFIG_DEDICATED),
        O("pucch_cfg_ded", PUCCH_CONFIG_DEDICATED),
        O("pusch_cfg_ded", PUSCH_CONFIG_DEDICATED),
        O("ul_pwr_ctrl_ded", UL_POWER_CONTROL_DEDICATED),
        O("tpc_pdcch_cfg_pucch", TPC_PDCCH_CONFIG),
        O("tpc_pdcch_cfg_pusch", TPC_PDCCH_CONFIG),
        O("cqi_report_cfg", CQI_REPORT_CONFIG),
        O("srs_ul_cfg_ded", SRS_UL_CONFIG_DEDICATED),
        O("ant_info", explicit_default(ANTENNA_INFO_DEDICATED)),
        O("sched_request_cfg", SCHEDULING_REQUEST_CONFIG),
    ],
    ext=True,
)

# ------------------------------------------- RadioResourceConfigDedicated

SRB_TO_ADD_MOD = Seq(
    [
        M("srb_id", Int(1, 2)),
        O("rlc_cfg", explicit_default(RLC_CONFIG)),
        O("lc_ch_cfg", explicit_default(LOGICAL_CHANNEL_CONFIG)),
    ],
    ext=True,
)

DRB_TO_ADD_MOD = Seq(
    [
        O("eps_bearer_id", Int(0, 15)),
        M("drb_id", Int(1, 32)),
        O("pdcp_cfg", PDCP_CONFIG),
        O("rlc_cfg", RLC_CONFIG),
        O("lc_ch_id", Int(3, 10)),
        O("lc_ch_cfg", LOGICAL_CHANNEL_CONFIG),
    ],
    ext=True,
)

RLF_TIMERS_AND_CONSTANTS_R9 = setup_release(
    Seq(
        [
            M("t301_r9", Enum(["ms100", "ms200", "ms300", "ms400", "ms600", "ms1000", "ms1500", "ms2000"])),
            M("t310_r9", Enum(["ms0", "ms50", "ms100", "ms200", "ms500", "ms1000", "ms2000"])),
            M("n310_r9", Enum(["n1", "n2", "n3", "n4", "n6", "n8", "n10", "n20"])),
            M("t311_r9", Enum(["ms1000", "ms3000", "ms5000", "ms10000", "ms15000", "ms20000", "ms30000"])),
            M("n311_r9", Enum(["n1", "n2", "n3", "n4", "n5", "n6", "n8", "n10"])),
        ],
        ext=True,
    )
)

RADIO_RESOURCE_CONFIG_DEDICATED = Seq(
    [
        O("srb_to_add_mod_list", SeqOf(SRB_TO_ADD_MOD, 1, 2)),
        O("drb_to_add_mod_list", SeqOf(DRB_TO_ADD_MOD, 1, 11)),
        O("drb_to_release_list", SeqOf(Int(1, 32), 1, 11)),
        O("mac_main_cfg", explicit_default(MAC_MAIN_CONFIG)),
        O("sps_cfg", SPS_CONFIG),
        O("phys_cfg_ded", PHYSICAL_CONFIG_DEDICATED),
    ],
    ext=True,
    ext_additions=[
        M("rlf_timers_and_consts_r9", RLF_TIMERS_AND_CONSTANTS_R9),
    ],
)

# --------------------------------------------------------- DL-CCCH messages

RRC_CONN_SETUP = Seq(
    [
        M("rrc_transaction_id", Int(0, 3)),
        M(
            "crit_exts",
            crit_ext_c1(
                "rrc_conn_setup",
                Seq(
                    [
                        M("rr_cfg_ded", RADIO_RESOURCE_CONFIG_DEDICATED),
                        O("non_crit_ext", Seq([O("late_non_crit_ext", OctStr()), O("non_crit_ext", Seq([]))])),
                    ]
                ),
                7,
            ),
        ),
    ]
)

RRC_CONN_REJECT = Seq(
    [
        M(
            "crit_exts",
            crit_ext_c1(
                "rrc_conn_reject",
                Seq([M("wait_time", Int(1, 16)), O("non_crit_ext", Seq([O("late_non_crit_ext", OctStr()), O("non_crit_ext", Seq([]))]))]),
                3,
            ),
        ),
    ]
)

RRC_CONN_REEST = Seq(
    [
        M("rrc_transaction_id", Int(0, 3)),
        M(
            "crit_exts",
            crit_ext_c1(
                "rrc_conn_reest",
                Seq(
                    [
                        M("rr_cfg_ded", RADIO_RESOURCE_CONFIG_DEDICATED),
                        M("next_hop_chaining_count", Int(0, 7)),
                        O("non_crit_ext", Seq([O("late_non_crit_ext", OctStr()), O("non_crit_ext", Seq([]))])),
                    ]
                ),
                7,
            ),
        ),
    ]
)

RRC_CONN_REEST_REJECT = Seq(
    [
        M(
            "crit_exts",
            Choice(
                [
                    (
                        "rrc_conn_reest_reject_r8",
                        Seq([O("non_crit_ext", Seq([O("late_non_crit_ext", OctStr()), O("non_crit_ext", Seq([]))]))]),
                    ),
                    ("crit_exts_future", Seq([])),
                ]
            ),
        ),
    ]
)

DL_CCCH_MESSAGE = Seq(
    [
        M(
            "msg",
            Choice(
                [
                    (
                        "c1",
                        Choice(
                            [
                                ("rrc_conn_reest", RRC_CONN_REEST),
                                ("rrc_conn_reest_reject", RRC_CONN_REEST_REJECT),
                                ("rrc_conn_reject", RRC_CONN_REJECT),
                                ("rrc_conn_setup", RRC_CONN_SETUP),
                            ]
                        ),
                    ),
                    ("msg_class_ext", Seq([])),
                ]
            ),
        )
    ]
)

# ----------------------------------------------------------------- MIB/BCCH

MIB = Seq(
    [
        M("dl_bw", Enum(["n6", "n15", "n25", "n50", "n75", "n100"])),
        M(
            "phich_cfg",
            Seq(
                [
                    M("phich_dur", Enum(["normal", "extended"])),
                    M("phich_res", Enum(["one_sixth", "half", "one", "two"])),
                ]
            ),
        ),
        M("sys_frame_num", BitStr(8)),
        M("sched_info_sib1_br_r13", Int(0, 31)),
        M("sys_info_unchanged_br_r15", Bool()),
        M("spare", BitStr(4)),
    ]
)

BCCH_BCH_MESSAGE = Seq([M("msg", MIB)])
