// Golden-vector generator: packs a message set covering the newly
// implemented TS 36.331 branches with the reference's own codec and
// prints "<name> <hex>" lines.
#include "srslte/asn1/rrc_asn1.h"
#include <cstdio>
#include <string>

using namespace asn1;
using namespace asn1::rrc;

template <class T>
static void emit(const char* name, const T& pdu)
{
  uint8_t  buf[8192];
  bit_ref  bref(buf, sizeof(buf));
  if (pdu.pack(bref) != SRSASN_SUCCESS) {
    printf("%s PACK_FAIL\n", name);
    return;
  }
  int nbytes = bref.distance_bytes();
  std::string hex;
  char tmp[4];
  for (int i = 0; i < nbytes; i++) {
    sprintf(tmp, "%02x", buf[i]);
    hex += tmp;
  }
  printf("%s %s\n", name, hex.c_str());
}

static bcch_dl_sch_msg_s si_with(const sib_info_item_c& item)
{
  bcch_dl_sch_msg_s m;
  auto& si = m.msg.set_c1().set_sys_info().crit_exts.set_sys_info_r8();
  si.sib_type_and_info.push_back(item);
  return m;
}

int main()
{
  // ---------------- SIB4 ----------------
  {
    sib_info_item_c it;
    auto& s = it.set_sib4();
    s.intra_freq_neigh_cell_list_present = true;
    s.intra_freq_neigh_cell_list.resize(2);
    s.intra_freq_neigh_cell_list[0].pci = 42;
    s.intra_freq_neigh_cell_list[0].q_offset_cell = q_offset_range_e::db_minus2;
    s.intra_freq_neigh_cell_list[1].pci = 501;
    s.intra_freq_neigh_cell_list[1].q_offset_cell = q_offset_range_e::db6;
    s.intra_freq_black_cell_list_present = true;
    s.intra_freq_black_cell_list.resize(1);
    s.intra_freq_black_cell_list[0].start = 100;
    s.intra_freq_black_cell_list[0].range_present = true;
    s.intra_freq_black_cell_list[0].range = pci_range_s::range_e_::n8;
    s.csg_pci_range_present = true;
    s.csg_pci_range.start = 200;
    emit("sib4", si_with(it));
  }
  // ---------------- SIB5 (with r9 ext group) ----------------
  {
    sib_info_item_c it;
    auto& s = it.set_sib5();
    s.inter_freq_carrier_freq_list.resize(1);
    auto& f = s.inter_freq_carrier_freq_list[0];
    f.dl_carrier_freq = 3400;
    f.q_rx_lev_min    = -60;
    f.p_max_present   = true;
    f.p_max           = 10;
    f.t_resel_eutra   = 2;
    f.thresh_x_high   = 12;
    f.thresh_x_low    = 4;
    f.allowed_meas_bw = allowed_meas_bw_e::mbw50;
    f.presence_ant_port1 = true;
    f.cell_resel_prio_present = true;
    f.cell_resel_prio = 5;
    f.neigh_cell_cfg.from_number(1);
    f.q_offset_freq_present = true;
    f.q_offset_freq = q_offset_range_e::db_minus6;
    f.inter_freq_neigh_cell_list_present = true;
    f.inter_freq_neigh_cell_list.resize(1);
    f.inter_freq_neigh_cell_list[0].pci = 77;
    f.inter_freq_neigh_cell_list[0].q_offset_cell = q_offset_range_e::db0;
    f.ext = true;
    f.q_qual_min_r9_present = true;
    f.q_qual_min_r9 = -20;
    f.thresh_x_q_r9.set_present(true);
    f.thresh_x_q_r9->thresh_x_high_q_r9 = 11;
    f.thresh_x_q_r9->thresh_x_low_q_r9  = 3;
    emit("sib5", si_with(it));
  }
  // ---------------- SIB6 ----------------
  {
    sib_info_item_c it;
    auto& s = it.set_sib6();
    s.carrier_freq_list_utra_fdd_present = true;
    s.carrier_freq_list_utra_fdd.resize(1);
    auto& u = s.carrier_freq_list_utra_fdd[0];
    u.carrier_freq = 10563;
    u.cell_resel_prio_present = true;
    u.cell_resel_prio = 3;
    u.thresh_x_high = 10;
    u.thresh_x_low  = 2;
    u.q_rx_lev_min  = -50;
    u.p_max_utra    = 20;
    u.q_qual_min    = -12;
    s.carrier_freq_list_utra_tdd_present = true;
    s.carrier_freq_list_utra_tdd.resize(1);
    auto& t = s.carrier_freq_list_utra_tdd[0];
    t.carrier_freq = 9400;
    t.thresh_x_high = 8;
    t.thresh_x_low = 1;
    t.q_rx_lev_min = -40;
    t.p_max_utra = -5;
    s.t_resel_utra = 3;
    s.t_resel_utra_sf_present = true;
    s.t_resel_utra_sf.sf_medium = speed_state_scale_factors_s::sf_medium_e_::odot5;
    s.t_resel_utra_sf.sf_high   = speed_state_scale_factors_s::sf_high_e_::odot75;
    emit("sib6", si_with(it));
  }
  // ---------------- SIB7 ----------------
  {
    sib_info_item_c it;
    auto& s = it.set_sib7();
    s.t_resel_geran = 1;
    s.carrier_freqs_info_list_present = true;
    s.carrier_freqs_info_list.resize(1);
    auto& g = s.carrier_freqs_info_list[0];
    g.carrier_freqs.start_arfcn = 512;
    g.carrier_freqs.band_ind = band_ind_geran_e::dcs1800;
    auto& fa = g.carrier_freqs.following_arfcns.set_equally_spaced_arfcns();
    fa.arfcn_spacing = 2;
    fa.nof_following_arfcns = 5;
    g.common_info.cell_resel_prio_present = true;
    g.common_info.cell_resel_prio = 1;
    g.common_info.ncc_permitted.from_number(0xff);
    g.common_info.q_rx_lev_min = 10;
    g.common_info.p_max_geran_present = true;
    g.common_info.p_max_geran = 30;
    g.common_info.thresh_x_high = 9;
    g.common_info.thresh_x_low = 6;
    emit("sib7", si_with(it));
  }
  // ---------------- SIB8 ----------------
  {
    sib_info_item_c it;
    auto& s = it.set_sib8();
    s.sys_time_info_present = true;
    s.sys_time_info.cdma_eutra_synchronisation = true;
    s.sys_time_info.cdma_sys_time.set_sync_sys_time().from_number(0x123456789aULL);
    s.search_win_size_present = true;
    s.search_win_size = 7;
    s.params_hrpd_present = true;
    s.params_hrpd.pre_regist_info_hrpd.pre_regist_allowed = true;
    s.params_hrpd.pre_regist_info_hrpd.pre_regist_zone_id_present = true;
    s.params_hrpd.pre_regist_info_hrpd.pre_regist_zone_id = 33;
    s.params_hrpd.pre_regist_info_hrpd.secondary_pre_regist_zone_id_list_present = true;
    s.params_hrpd.pre_regist_info_hrpd.secondary_pre_regist_zone_id_list.resize(2);
    s.params_hrpd.pre_regist_info_hrpd.secondary_pre_regist_zone_id_list[0] = 1;
    s.params_hrpd.pre_regist_info_hrpd.secondary_pre_regist_zone_id_list[1] = 200;
    s.params_hrpd.cell_resel_params_hrpd_present = true;
    auto& crp = s.params_hrpd.cell_resel_params_hrpd;
    crp.band_class_list.resize(1);
    crp.band_class_list[0].band_class = bandclass_cdma2000_e::bc5;
    crp.band_class_list[0].cell_resel_prio_present = true;
    crp.band_class_list[0].cell_resel_prio = 4;
    crp.band_class_list[0].thresh_x_high = 40;
    crp.band_class_list[0].thresh_x_low = 20;
    crp.neigh_cell_list.resize(1);
    crp.neigh_cell_list[0].band_class = bandclass_cdma2000_e::bc1;
    crp.neigh_cell_list[0].neigh_cells_per_freq_list.resize(1);
    crp.neigh_cell_list[0].neigh_cells_per_freq_list[0].arfcn = 1000;
    crp.neigh_cell_list[0].neigh_cells_per_freq_list[0].pci_list.resize(2);
    crp.neigh_cell_list[0].neigh_cells_per_freq_list[0].pci_list[0] = 17;
    crp.neigh_cell_list[0].neigh_cells_per_freq_list[0].pci_list[1] = 400;
    crp.t_resel_cdma2000 = 6;
    s.params1_xrtt_present = true;
    s.params1_xrtt.csfb_regist_param1_xrtt_present = true;
    auto& cs = s.params1_xrtt.csfb_regist_param1_xrtt;
    cs.sid.from_number(0x1234);
    cs.nid.from_number(0x5678);
    cs.multiple_sid = true;
    cs.multiple_nid = false;
    cs.home_reg = true;
    cs.foreign_sid_reg = false;
    cs.foreign_nid_reg = true;
    cs.param_reg = false;
    cs.pwr_up_reg = true;
    cs.regist_period.from_number(0x55);
    cs.regist_zone.from_number(0xabc);
    cs.total_zone.from_number(5);
    cs.zone_timer.from_number(2);
    s.params1_xrtt.long_code_state1_xrtt_present = true;
    s.params1_xrtt.long_code_state1_xrtt.from_number(0x2aaaaaaaaaaULL);
    emit("sib8", si_with(it));
  }
  // ---------------- SIB9 / SIB10 / SIB11 ----------------
  {
    sib_info_item_c it;
    auto& s = it.set_sib9();
    s.hnb_name_present = true;
    const char* nm = "tpu-cell";
    s.hnb_name.resize(8);
    memcpy(s.hnb_name.data(), nm, 8);
    emit("sib9", si_with(it));
  }
  {
    sib_info_item_c it;
    auto& s = it.set_sib10();
    s.msg_id.from_number(0x1112);
    s.serial_num.from_number(0x3344);
    s.warning_type[0] = 0x07;
    s.warning_type[1] = 0x80;
    emit("sib10", si_with(it));
  }
  {
    sib_info_item_c it;
    auto& s = it.set_sib11();
    s.msg_id.from_number(0x2222);
    s.serial_num.from_number(0x9999);
    s.warning_msg_segment_type = sib_type11_s::warning_msg_segment_type_e_::last_segment;
    s.warning_msg_segment_num = 3;
    s.warning_msg_segment.resize(5);
    for (int i = 0; i < 5; i++) s.warning_msg_segment[i] = 0xa0 + i;
    s.data_coding_scheme_present = true;
    s.data_coding_scheme[0] = 0x0f;
    emit("sib11", si_with(it));
  }
  // ---------------- SIB12 / SIB13 (extension alternatives) ------------
  {
    sib_info_item_c it;
    auto& s = it.set_sib12_v920();
    s.msg_id_r9.from_number(0x4321);
    s.serial_num_r9.from_number(0x8765);
    s.warning_msg_segment_type_r9 = sib_type12_r9_s::warning_msg_segment_type_r9_e_::not_last_segment;
    s.warning_msg_segment_num_r9 = 1;
    s.warning_msg_segment_r9.resize(3);
    s.warning_msg_segment_r9[0] = 0xde; s.warning_msg_segment_r9[1] = 0xad; s.warning_msg_segment_r9[2] = 0xbe;
    emit("sib12", si_with(it));
  }
  {
    sib_info_item_c it;
    auto& s = it.set_sib13_v920();
    s.mbsfn_area_info_list_r9.resize(1);
    auto& a = s.mbsfn_area_info_list_r9[0];
    a.mbsfn_area_id_r9 = 77;
    a.non_mbsfn_region_len = mbsfn_area_info_r9_s::non_mbsfn_region_len_e_::s2;
    a.notif_ind_r9 = 2;
    a.mcch_cfg_r9.mcch_repeat_period_r9 = mbsfn_area_info_r9_s::mcch_cfg_r9_s_::mcch_repeat_period_r9_e_::rf64;
    a.mcch_cfg_r9.mcch_offset_r9 = 5;
    a.mcch_cfg_r9.mcch_mod_period_r9 = mbsfn_area_info_r9_s::mcch_cfg_r9_s_::mcch_mod_period_r9_e_::rf1024;
    a.mcch_cfg_r9.sf_alloc_info_r9.from_number(0x2a);
    a.mcch_cfg_r9.sig_mcs_r9 = mbsfn_area_info_r9_s::mcch_cfg_r9_s_::sig_mcs_r9_e_::n13;
    s.notif_cfg_r9.notif_repeat_coeff_r9 = mbms_notif_cfg_r9_s::notif_repeat_coeff_r9_e_::n4;
    s.notif_cfg_r9.notif_offset_r9 = 9;
    s.notif_cfg_r9.notif_sf_idx_r9 = 4;
    emit("sib13", si_with(it));
  }
  // ---------------- RRCConnectionReconfiguration with inter-RAT meas --
  {
    dl_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_rrc_conn_recfg().crit_exts.set_c1().set_rrc_conn_recfg_r8();
    m.msg.c1().rrc_conn_recfg().rrc_transaction_id = 1;
    r8.meas_cfg_present = true;
    auto& mc = r8.meas_cfg;
    mc.meas_obj_to_add_mod_list_present = true;
    mc.meas_obj_to_add_mod_list.resize(3);
    mc.meas_obj_to_add_mod_list[0].meas_obj_id = 2;
    auto& mu = mc.meas_obj_to_add_mod_list[0].meas_obj.set_meas_obj_utra();
    mu.carrier_freq = 10563;
    mu.offset_freq_present = true;
    mu.offset_freq = -7;
    mu.cells_to_add_mod_list_present = true;
    auto& cl = mu.cells_to_add_mod_list.set_cells_to_add_mod_list_utra_fdd();
    cl.resize(1);
    cl[0].cell_idx = 4;
    cl[0].pci = 212;
    mu.cell_for_which_to_report_cgi_present = true;
    mu.cell_for_which_to_report_cgi.set_utra_fdd() = 300;
    mc.meas_obj_to_add_mod_list[1].meas_obj_id = 3;
    auto& mg = mc.meas_obj_to_add_mod_list[1].meas_obj.set_meas_obj_geran();
    mg.carrier_freqs.start_arfcn = 871;
    mg.carrier_freqs.band_ind = band_ind_geran_e::pcs1900;
    auto& el = mg.carrier_freqs.following_arfcns.set_explicit_list_of_arfcns();
    el.resize(2);
    el[0] = 880;
    el[1] = 910;
    mg.ncc_permitted_present = true;
    mg.ncc_permitted.from_number(0x81);
    mc.meas_obj_to_add_mod_list[2].meas_obj_id = 4;
    auto& mcd = mc.meas_obj_to_add_mod_list[2].meas_obj.set_meas_obj_cdma2000();
    mcd.cdma2000_type = cdma2000_type_e::type_hrpd;
    mcd.carrier_freq.band_class = bandclass_cdma2000_e::bc0;
    mcd.carrier_freq.arfcn = 333;
    mcd.search_win_size_present = true;
    mcd.search_win_size = 8;
    mc.report_cfg_to_add_mod_list_present = true;
    mc.report_cfg_to_add_mod_list.resize(2);
    mc.report_cfg_to_add_mod_list[0].report_cfg_id = 1;
    auto& rc = mc.report_cfg_to_add_mod_list[0].report_cfg.set_report_cfg_inter_rat();
    auto& ev = rc.trigger_type.set_event();
    auto& b1 = ev.event_id.set_event_b1();
    b1.b1_thres.set_b1_thres_utra().set_utra_rscp() = -3;
    ev.hysteresis = 4;
    ev.time_to_trigger = time_to_trigger_e::ms320;
    rc.max_report_cells = 4;
    rc.report_interv = report_interv_e::ms2048;
    rc.report_amount = report_cfg_inter_rat_s::report_amount_e_::r16;
    mc.report_cfg_to_add_mod_list[1].report_cfg_id = 2;
    auto& rc2 = mc.report_cfg_to_add_mod_list[1].report_cfg.set_report_cfg_inter_rat();
    auto& ev2 = rc2.trigger_type.set_event();
    auto& b2 = ev2.event_id.set_event_b2();
    b2.b2_thres1.set_thres_rsrp() = 50;
    b2.b2_thres2.set_b2_thres2_geran() = 30;
    ev2.hysteresis = 0;
    ev2.time_to_trigger = time_to_trigger_e::ms0;
    rc2.max_report_cells = 1;
    rc2.report_interv = report_interv_e::ms120;
    rc2.report_amount = report_cfg_inter_rat_s::report_amount_e_::infinity;
    mc.quant_cfg_present = true;
    mc.quant_cfg.quant_cfg_utra_present = true;
    mc.quant_cfg.quant_cfg_utra.meas_quant_utra_fdd = quant_cfg_utra_s::meas_quant_utra_fdd_e_::cpich_ec_n0;
    mc.quant_cfg.quant_cfg_utra.filt_coef_present = true;
    mc.quant_cfg.quant_cfg_utra.filt_coef = filt_coef_e::fc6;
    mc.quant_cfg.quant_cfg_geran_present = true;
    mc.quant_cfg.quant_cfg_geran.filt_coef_present = true;
    mc.quant_cfg.quant_cfg_geran.filt_coef = filt_coef_e::fc3;
    mc.quant_cfg.quant_cfg_cdma2000_present = true;
    mc.quant_cfg.quant_cfg_cdma2000.meas_quant_cdma2000 =
        quant_cfg_cdma2000_s::meas_quant_cdma2000_e_::pilot_pn_phase_and_pilot_strength;
    mc.pre_regist_info_hrpd_present = true;
    mc.pre_regist_info_hrpd.pre_regist_allowed = false;
    emit("recfg_interrat_meas", m);
  }
  // ---------------- RRCConnectionRelease w/ geran redirect + prio ----
  {
    dl_dcch_msg_s m;
    auto& rel = m.msg.set_c1().set_rrc_conn_release().crit_exts.set_c1().set_rrc_conn_release_r8();
    m.msg.c1().rrc_conn_release().rrc_transaction_id = 2;
    rel.release_cause = release_cause_e::other;
    rel.redirected_carrier_info_present = true;
    auto& rg = rel.redirected_carrier_info.set_geran();
    rg.start_arfcn = 64;
    rg.band_ind = band_ind_geran_e::dcs1800;
    rg.following_arfcns.set_variable_bit_map_of_arfcns().resize(2);
    rg.following_arfcns.variable_bit_map_of_arfcns()[0] = 0xf0;
    rg.following_arfcns.variable_bit_map_of_arfcns()[1] = 0x0f;
    rel.idle_mode_mob_ctrl_info_present = true;
    auto& im = rel.idle_mode_mob_ctrl_info;
    im.freq_prio_list_eutra_present = true;
    im.freq_prio_list_eutra.resize(1);
    im.freq_prio_list_eutra[0].carrier_freq = 1300;
    im.freq_prio_list_eutra[0].cell_resel_prio = 7;
    im.freq_prio_list_geran_present = true;
    im.freq_prio_list_geran.resize(1);
    im.freq_prio_list_geran[0].carrier_freqs.start_arfcn = 32;
    im.freq_prio_list_geran[0].carrier_freqs.band_ind = band_ind_geran_e::pcs1900;
    auto& ge = im.freq_prio_list_geran[0].carrier_freqs.following_arfcns.set_equally_spaced_arfcns();
    ge.arfcn_spacing = 1;
    ge.nof_following_arfcns = 0;
    im.freq_prio_list_geran[0].cell_resel_prio = 2;
    im.freq_prio_list_utra_fdd_present = true;
    im.freq_prio_list_utra_fdd.resize(1);
    im.freq_prio_list_utra_fdd[0].carrier_freq = 9999;
    im.freq_prio_list_utra_fdd[0].cell_resel_prio = 1;
    im.band_class_prio_list_hrpd_present = true;
    im.band_class_prio_list_hrpd.resize(1);
    im.band_class_prio_list_hrpd[0].band_class = bandclass_cdma2000_e::bc3;
    im.band_class_prio_list_hrpd[0].cell_resel_prio = 0;
    im.t320_present = true;
    im.t320 = idle_mode_mob_ctrl_info_s::t320_e_::min30;
    emit("release_redirect_geran", m);
  }
  // ---------------- MobilityFromEUTRACommand ----------------
  {
    dl_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_mob_from_eutra_cmd().crit_exts.set_c1().set_mob_from_eutra_cmd_r8();
    m.msg.c1().mob_from_eutra_cmd().rrc_transaction_id = 0;
    r8.cs_fallback_ind = true;
    auto& ho = r8.purpose.set_ho();
    ho.target_rat_type = ho_s::target_rat_type_e_::geran;
    ho.target_rat_msg_container.resize(4);
    for (int i = 0; i < 4; i++) ho.target_rat_msg_container[i] = 0x10 + i;
    ho.nas_security_param_from_eutra_present = true;
    ho.nas_security_param_from_eutra[0] = 0x5a;
    ho.sys_info_present = true;
    auto& sil = ho.sys_info.set_si();
    sil.resize(1);
    sil[0].resize(3);
    sil[0][0] = 1; sil[0][1] = 2; sil[0][2] = 3;
    emit("mob_from_eutra_ho", m);
  }
  {
    dl_dcch_msg_s m;
    auto& r9 = m.msg.set_c1().set_mob_from_eutra_cmd().crit_exts.set_c1().set_mob_from_eutra_cmd_r9();
    m.msg.c1().mob_from_eutra_cmd().rrc_transaction_id = 3;
    r9.cs_fallback_ind = false;
    auto& cco = r9.purpose.set_cell_change_order();
    cco.t304 = cell_change_order_s::t304_e_::ms2000;
    auto& tg = cco.target_rat_type.geran();
    tg.pci.network_colour_code.from_number(5);
    tg.pci.base_station_colour_code.from_number(3);
    tg.carrier_freq.arfcn = 77;
    tg.carrier_freq.band_ind = band_ind_geran_e::dcs1800;
    emit("mob_from_eutra_cco_r9", m);
  }
  // ---------------- CSFB / HandoverFromEUTRAPrep ----------------
  {
    dl_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_csfb_params_resp_cdma2000().crit_exts.set_csfb_params_resp_cdma2000_r8();
    m.msg.c1().csfb_params_resp_cdma2000().rrc_transaction_id = 1;
    r8.rand.from_number(0xdeadbeefULL);
    r8.mob_params.resize(3);
    r8.mob_params[0] = 9; r8.mob_params[1] = 8; r8.mob_params[2] = 7;
    emit("csfb_params_resp", m);
  }
  {
    dl_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_ho_from_eutra_prep_request().crit_exts.set_c1().set_ho_from_eutra_prep_request_r8();
    m.msg.c1().ho_from_eutra_prep_request().rrc_transaction_id = 2;
    r8.cdma2000_type = cdma2000_type_e::type1_xrtt;
    r8.rand_present = true;
    r8.rand.from_number(0x11223344ULL);
    r8.mob_params_present = true;
    r8.mob_params.resize(2);
    r8.mob_params[0] = 0xca; r8.mob_params[1] = 0xfe;
    emit("ho_from_eutra_prep", m);
  }
  // ---------------- CounterCheck / UEInformationRequest --------------
  {
    dl_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_counter_check().crit_exts.set_c1().set_counter_check_r8();
    m.msg.c1().counter_check().rrc_transaction_id = 3;
    r8.drb_count_msb_info_list.resize(2);
    r8.drb_count_msb_info_list[0].drb_id = 1;
    r8.drb_count_msb_info_list[0].count_msb_ul = 123456;
    r8.drb_count_msb_info_list[0].count_msb_dl = 33554431;
    r8.drb_count_msb_info_list[1].drb_id = 32;
    r8.drb_count_msb_info_list[1].count_msb_ul = 0;
    r8.drb_count_msb_info_list[1].count_msb_dl = 1;
    emit("counter_check", m);
  }
  {
    dl_dcch_msg_s m;
    auto& r9 = m.msg.set_c1().set_ue_info_request_r9().crit_exts.set_c1().set_ue_info_request_r9();
    m.msg.c1().ue_info_request_r9().rrc_transaction_id = 0;
    r9.rach_report_req_r9 = true;
    r9.rlf_report_req_r9 = true;
    emit("ue_info_request", m);
  }
  // ---------------- LoggedMeasurementConfiguration ----------------
  {
    dl_dcch_msg_s m;
    auto& r10 = m.msg.set_c1().set_logged_meas_cfg_r10().crit_exts.set_c1().set_logged_meas_cfg_r10();
    r10.trace_ref_r10.plmn_id_r10.mcc_present = true;
    r10.trace_ref_r10.plmn_id_r10.mcc[0] = 0;
    r10.trace_ref_r10.plmn_id_r10.mcc[1] = 0;
    r10.trace_ref_r10.plmn_id_r10.mcc[2] = 1;
    r10.trace_ref_r10.plmn_id_r10.mnc.resize(2);
    r10.trace_ref_r10.plmn_id_r10.mnc[0] = 0;
    r10.trace_ref_r10.plmn_id_r10.mnc[1] = 1;
    r10.trace_ref_r10.trace_id_r10[0] = 1;
    r10.trace_ref_r10.trace_id_r10[1] = 2;
    r10.trace_ref_r10.trace_id_r10[2] = 3;
    r10.trace_recording_session_ref_r10[0] = 9;
    r10.trace_recording_session_ref_r10[1] = 8;
    r10.tce_id_r10[0] = 0x42;
    r10.absolute_time_info_r10.from_number(0x200101020304ULL);
    r10.area_cfg_r10_present = true;
    auto& tl = r10.area_cfg_r10.set_tac_list_r10();
    tl.resize(1);
    tl[0].from_number(0x1234);
    r10.logging_dur_r10 = logging_dur_r10_e::min40;
    r10.logging_interv_r10 = logging_interv_r10_e::ms5120;
    emit("logged_meas_cfg", m);
  }
  // ---------------- UL: CounterCheckResponse / UEInformationResponse -
  {
    ul_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_counter_check_resp().crit_exts.set_counter_check_resp_r8();
    m.msg.c1().counter_check_resp().rrc_transaction_id = 3;
    // NOTE: srsLTE 20.10's bit_ref::pack rejects 32-bit fields and
    // pack_constrained_whole_number drops the error, so the reference
    // encoder CANNOT emit drb-Count values — use the empty list here
    // (the nonempty case is covered by a self-roundtrip test).
    emit("counter_check_resp", m);
  }
  {
    ul_dcch_msg_s m;
    auto& r9 = m.msg.set_c1().set_ue_info_resp_r9().crit_exts.set_c1().set_ue_info_resp_r9();
    m.msg.c1().ue_info_resp_r9().rrc_transaction_id = 1;
    r9.rach_report_r9_present = true;
    r9.rach_report_r9.nof_preambs_sent_r9 = 17;
    r9.rach_report_r9.contention_detected_r9 = true;
    r9.rlf_report_r9_present = true;
    r9.rlf_report_r9.meas_result_last_serv_cell_r9.rsrp_result_r9 = 60;
    r9.rlf_report_r9.meas_result_last_serv_cell_r9.rsrq_result_r9_present = true;
    r9.rlf_report_r9.meas_result_last_serv_cell_r9.rsrq_result_r9 = 20;
    r9.rlf_report_r9.meas_result_neigh_cells_r9_present = true;
    auto& nc = r9.rlf_report_r9.meas_result_neigh_cells_r9;
    nc.meas_result_list_eutra_r9_present = true;
    nc.meas_result_list_eutra_r9.resize(1);
    nc.meas_result_list_eutra_r9[0].carrier_freq_r9 = 2400;
    nc.meas_result_list_eutra_r9[0].meas_result_list_r9.resize(1);
    nc.meas_result_list_eutra_r9[0].meas_result_list_r9[0].pci = 11;
    nc.meas_result_list_eutra_r9[0].meas_result_list_r9[0].meas_result.rsrp_result_present = true;
    nc.meas_result_list_eutra_r9[0].meas_result_list_r9[0].meas_result.rsrp_result = 44;
    nc.meas_result_list_utra_r9_present = true;
    nc.meas_result_list_utra_r9.resize(1);
    nc.meas_result_list_utra_r9[0].carrier_freq_r9 = 10563;
    nc.meas_result_list_utra_r9[0].meas_result_list_r9.resize(1);
    auto& ur = nc.meas_result_list_utra_r9[0].meas_result_list_r9[0];
    ur.pci.set_fdd() = 101;
    ur.meas_result.utra_rscp_present = true;
    ur.meas_result.utra_rscp = 33;
    nc.meas_result_list_geran_r9_present = true;
    nc.meas_result_list_geran_r9.resize(1);
    auto& gr = nc.meas_result_list_geran_r9[0];
    gr.carrier_freq.arfcn = 514;
    gr.carrier_freq.band_ind = band_ind_geran_e::pcs1900;
    gr.pci.network_colour_code.from_number(1);
    gr.pci.base_station_colour_code.from_number(7);
    gr.meas_result.rssi = 45;
    nc.meas_results_cdma2000_r9_present = true;
    nc.meas_results_cdma2000_r9.resize(1);
    nc.meas_results_cdma2000_r9[0].carrier_freq_r9.band_class = bandclass_cdma2000_e::bc10;
    nc.meas_results_cdma2000_r9[0].carrier_freq_r9.arfcn = 150;
    nc.meas_results_cdma2000_r9[0].meas_result_list_r9.pre_regist_status_hrpd = true;
    nc.meas_results_cdma2000_r9[0].meas_result_list_r9.meas_result_list_cdma2000.resize(1);
    auto& cr = nc.meas_results_cdma2000_r9[0].meas_result_list_r9.meas_result_list_cdma2000[0];
    cr.pci = 63;
    cr.meas_result.pilot_pn_phase_present = true;
    cr.meas_result.pilot_pn_phase = 30000;
    cr.meas_result.pilot_strength = 21;
    emit("ue_info_resp", m);
  }
  // ---------------- ProximityIndication / ULHoPrepTransfer ----------
  {
    ul_dcch_msg_s m;
    auto& r9 = m.msg.set_c1().set_proximity_ind_r9().crit_exts.set_c1().set_proximity_ind_r9();
    r9.type_r9 = proximity_ind_r9_ies_s::type_r9_e_::entering;
    r9.carrier_freq_r9.set_eutra_r9() = 2400;
    emit("proximity_ind", m);
  }
  {
    ul_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_ul_ho_prep_transfer().crit_exts.set_c1().set_ul_ho_prep_transfer_r8();
    r8.cdma2000_type = cdma2000_type_e::type1_xrtt;
    r8.meid_present = true;
    r8.meid.from_number(0xa1b2c3d4e5f6ULL);
    r8.ded_info.resize(2);
    r8.ded_info[0] = 0x77; r8.ded_info[1] = 0x88;
    emit("ul_ho_prep_transfer", m);
  }
  // ---------------- CSFBParametersRequest ----------------
  {
    ul_dcch_msg_s m;
    m.msg.set_c1().set_csfb_params_request_cdma2000().crit_exts.set_csfb_params_request_cdma2000_r8();
    emit("csfb_params_request", m);
  }
  // ---------------- RNReconfiguration(+Complete) ----------------
  {
    dl_dcch_msg_s m;
    auto& r10 = m.msg.set_c1().set_rn_recfg_r10().crit_exts.set_c1().set_rn_recfg_r10();
    m.msg.c1().rn_recfg_r10().rrc_transaction_id = 2;
    r10.rn_sf_cfg_r10_present = true;
    r10.rn_sf_cfg_r10.sf_cfg_pattern_r10_present = true;
    r10.rn_sf_cfg_r10.sf_cfg_pattern_r10.set_sf_cfg_pattern_fdd_r10().from_number(0x5a);
    r10.rn_sf_cfg_r10.rpdcch_cfg_r10_present = true;
    auto& rp = r10.rn_sf_cfg_r10.rpdcch_cfg_r10;
    rp.res_alloc_type_r10 = rn_sf_cfg_r10_s::rpdcch_cfg_r10_s_::res_alloc_type_r10_e_::type0;
    rp.res_block_assign_r10.set_type01_r10().set_nrb25_r10().from_number(0x1042);
    rp.demod_rs_r10.set_no_interleaving_r10();
    rp.demod_rs_r10.no_interleaving_r10() =
        rn_sf_cfg_r10_s::rpdcch_cfg_r10_s_::demod_rs_r10_c_::no_interleaving_r10_e_::dmrs;
    rp.pdsch_start_r10 = 2;
    auto& fdd = rp.pucch_cfg_r10.set_fdd();
    fdd.n1_pucch_an_p0_r10 = 512;
    fdd.n1_pucch_an_p1_r10_present = true;
    fdd.n1_pucch_an_p1_r10 = 1024;
    emit("rn_recfg", m);
  }
  {
    ul_dcch_msg_s m;
    m.msg.set_c1().set_rn_recfg_complete_r10().crit_exts.set_c1().set_rn_recfg_complete_r10();
    m.msg.c1().rn_recfg_complete_r10().rrc_transaction_id = 2;
    emit("rn_recfg_complete", m);
  }
  // ---------------- MBMSCounting (MCCH request, UL response) --------
  {
    mcch_msg_s m;
    auto& req = m.msg.set_later().set_c2().mbms_count_request_r10();
    req.count_request_list_r10.resize(1);
    auto& t = req.count_request_list_r10[0].tmgi_r10;
    t.plmn_id_r9.set_plmn_idx_r9() = 4;
    t.service_id_r9[0] = 0; t.service_id_r9[1] = 0; t.service_id_r9[2] = 9;
    emit("mbms_count_request", m);
  }
  {
    ul_dcch_msg_s m;
    auto& resp = m.msg.set_c1().set_mbms_count_resp_r10().crit_exts.set_c1().set_count_resp_r10();
    resp.mbsfn_area_idx_r10_present = true;
    resp.mbsfn_area_idx_r10 = 3;
    resp.count_resp_list_r10_present = true;
    resp.count_resp_list_r10.resize(2);
    resp.count_resp_list_r10[0].count_resp_service_r10 = 0;
    resp.count_resp_list_r10[1].count_resp_service_r10 = 15;
    emit("mbms_count_resp", m);
  }
  // ---------------- InterFreqRSTDMeasurementIndication --------------
  {
    ul_dcch_msg_s m;
    auto& ind = m.msg.set_c1().set_inter_freq_rstd_meas_ind_r10().crit_exts.set_c1().set_inter_freq_rstd_meas_ind_r10();
    auto& st = ind.rstd_inter_freq_ind_r10.set_start();
    st.rstd_inter_freq_info_list_r10.resize(1);
    st.rstd_inter_freq_info_list_r10[0].carrier_freq_r10 = 5230;
    st.rstd_inter_freq_info_list_r10[0].meas_prs_offset_r10 = 19;
    emit("inter_freq_rstd_start", m);
  }
  // ---------------- SCell with dedicated config + OtherConfig -------
  {
    dl_dcch_msg_s m;
    auto& r8 = m.msg.set_c1().set_rrc_conn_recfg().crit_exts.set_c1().set_rrc_conn_recfg_r8();
    m.msg.c1().rrc_conn_recfg().rrc_transaction_id = 0;
    r8.non_crit_ext_present = true;
    r8.non_crit_ext.non_crit_ext_present = true;
    auto& v920 = r8.non_crit_ext.non_crit_ext;
    v920.other_cfg_r9_present = true;
    v920.other_cfg_r9.report_proximity_cfg_r9_present = true;
    v920.other_cfg_r9.report_proximity_cfg_r9.proximity_ind_eutra_r9_present = true;

    v920.non_crit_ext_present = true;
    auto& v1020 = v920.non_crit_ext;
    v1020.scell_to_add_mod_list_r10_present = true;
    v1020.scell_to_add_mod_list_r10.resize(1);
    auto& sc = v1020.scell_to_add_mod_list_r10[0];
    sc.scell_idx_r10 = 1;
    sc.cell_identif_r10_present = true;
    sc.cell_identif_r10.pci_r10 = 111;
    sc.cell_identif_r10.dl_carrier_freq_r10 = 3350;
    sc.rr_cfg_ded_scell_r10_present = true;
    sc.rr_cfg_ded_scell_r10.phys_cfg_ded_scell_r10_present = true;
    auto& ph = sc.rr_cfg_ded_scell_r10.phys_cfg_ded_scell_r10;
    ph.non_ul_cfg_r10_present = true;
    ph.non_ul_cfg_r10.ant_info_r10_present = true;
    ph.non_ul_cfg_r10.ant_info_r10.tx_mode_r10 = ant_info_ded_r10_s::tx_mode_r10_e_::tm3;
    ph.non_ul_cfg_r10.ant_info_r10.codebook_subset_restrict_r10_present = true;
    ph.non_ul_cfg_r10.ant_info_r10.codebook_subset_restrict_r10.resize(2);
    ph.non_ul_cfg_r10.ant_info_r10.codebook_subset_restrict_r10.from_number(0x3);
    ph.non_ul_cfg_r10.ant_info_r10.ue_tx_ant_sel.set(setup_e::release);
    ph.non_ul_cfg_r10.cross_carrier_sched_cfg_r10_present = true;
    auto& ccs = ph.non_ul_cfg_r10.cross_carrier_sched_cfg_r10.sched_cell_info_r10.set_other_r10();
    ccs.sched_cell_id_r10 = 0;
    ccs.pdsch_start_r10 = 2;
    ph.non_ul_cfg_r10.csi_rs_cfg_r10_present = true;
    ph.non_ul_cfg_r10.csi_rs_cfg_r10.csi_rs_r10_present = true;
    auto& csirs = ph.non_ul_cfg_r10.csi_rs_cfg_r10.csi_rs_r10.set_setup();
    csirs.ant_ports_count_r10 = csi_rs_cfg_r10_s::csi_rs_r10_c_::setup_s_::ant_ports_count_r10_e_::an2;
    csirs.res_cfg_r10 = 5;
    csirs.sf_cfg_r10 = 77;
    csirs.p_c_r10 = -2;
    ph.ul_cfg_r10_present = true;
    ph.ul_cfg_r10.cqi_report_cfg_scell_r10_present = true;
    ph.ul_cfg_r10.cqi_report_cfg_scell_r10.cqi_report_mode_aperiodic_r10_present = true;
    ph.ul_cfg_r10.cqi_report_cfg_scell_r10.cqi_report_mode_aperiodic_r10 = cqi_report_mode_aperiodic_e::rm30;
    ph.ul_cfg_r10.cqi_report_cfg_scell_r10.nom_pdsch_rs_epre_offset_r10 = 0;
    ph.ul_cfg_r10.cqi_report_cfg_scell_r10.cqi_report_periodic_scell_r10_present = true;
    auto& cp = ph.ul_cfg_r10.cqi_report_cfg_scell_r10.cqi_report_periodic_scell_r10.set_setup();
    cp.cqi_pucch_res_idx_r10 = 100;
    cp.cqi_pmi_cfg_idx = 37;
    cp.cqi_format_ind_periodic_r10.set_wideband_cqi_r10();
    cp.ri_cfg_idx_present = true;
    cp.ri_cfg_idx = 483;
    cp.simul_ack_nack_and_cqi = true;
    ph.ul_cfg_r10.srs_ul_cfg_ded_aperiodic_r10_present = true;
    auto& srs = ph.ul_cfg_r10.srs_ul_cfg_ded_aperiodic_r10.set_setup();
    srs.srs_cfg_idx_ap_r10 = 13;
    srs.srs_cfg_ap_dci_format4_r10_present = true;
    srs.srs_cfg_ap_dci_format4_r10.resize(1);
    srs.srs_cfg_ap_dci_format4_r10[0].srs_ant_port_ap_r10 = srs_ant_port_e::an2;
    srs.srs_cfg_ap_dci_format4_r10[0].srs_bw_ap_r10 = srs_cfg_ap_r10_s::srs_bw_ap_r10_e_::bw1;
    srs.srs_cfg_ap_dci_format4_r10[0].freq_domain_position_ap_r10 = 3;
    srs.srs_cfg_ap_dci_format4_r10[0].tx_comb_ap_r10 = 1;
    srs.srs_cfg_ap_dci_format4_r10[0].cyclic_shift_ap_r10 = srs_cfg_ap_r10_s::cyclic_shift_ap_r10_e_::cs4;
    ph.ul_cfg_r10.ul_pwr_ctrl_ded_scell_r10_present = true;
    auto& up = ph.ul_cfg_r10.ul_pwr_ctrl_ded_scell_r10;
    up.p0_ue_pusch_r10 = -3;
    up.delta_mcs_enabled_r10 = ul_pwr_ctrl_ded_scell_r10_s::delta_mcs_enabled_r10_e_::en1;
    up.accumulation_enabled_r10 = true;
    up.psrs_offset_r10 = 9;
    up.filt_coef_r10_present = true;
    up.filt_coef_r10 = filt_coef_e::fc8;
    up.pathloss_ref_linking_r10 = ul_pwr_ctrl_ded_scell_r10_s::pathloss_ref_linking_r10_e_::scell;
    emit("recfg_scell_ded", m);
  }
  return 0;
}
