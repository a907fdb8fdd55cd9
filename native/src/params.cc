// SPS / PPS / slice-header parsing + FMO slice-group maps.
// Clean-room from ISO 14496-10 §7.3.2, §7.3.3, §8.2.2.
// Reference parity: au_parser.cpp ParseSps/ParsePps, decoder_core.cpp
// ParseSliceHeaderSyntaxs, fmo.cpp.
#include "h264_syntax.h"

namespace h264pip {

static void parse_scaling_list(BitReader& br, u8* list, int size,
                               bool* use_default) {
  int last = 8, next = 8;
  *use_default = false;
  for (int i = 0; i < size; ++i) {
    if (next != 0) {
      i32 delta = br.se();
      next = (last + delta + 256) % 256;
      if (i == 0 && next == 0) {
        *use_default = true;
        return;
      }
    }
    last = (next == 0) ? last : next;
    list[i] = u8(last);
  }
}

// Default scaling lists (spec Tables 7-3 / 7-4), in zigzag scan order.
static const u8 kDefault4x4Intra[16] = {6, 13, 13, 20, 20, 20, 28, 28,
                                        28, 28, 32, 32, 32, 37, 37, 42};
static const u8 kDefault4x4Inter[16] = {10, 14, 14, 20, 20, 20, 24, 24,
                                        24, 24, 27, 27, 27, 30, 30, 34};
static const u8 kDefault8x8Intra[64] = {
    6,  10, 10, 13, 11, 13, 16, 16, 16, 16, 18, 18, 18, 18, 18, 23,
    23, 23, 23, 23, 23, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27,
    27, 27, 27, 27, 29, 29, 29, 29, 29, 29, 29, 31, 31, 31, 31, 31,
    31, 33, 33, 33, 33, 33, 36, 36, 36, 36, 38, 38, 38, 40, 40, 42};
static const u8 kDefault8x8Inter[64] = {
    9,  13, 13, 15, 13, 15, 17, 17, 17, 17, 19, 19, 19, 19, 19, 21,
    21, 21, 21, 21, 21, 22, 22, 22, 22, 22, 22, 22, 24, 24, 24, 24,
    24, 24, 24, 24, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27, 27,
    27, 28, 28, 28, 28, 28, 30, 30, 30, 30, 32, 32, 32, 33, 33, 35};

// Parse scaling matrices for SPS or PPS. `n_lists` is 8 or 12 (we support 8:
// chroma_format_idc != 3). Fallback rules per spec Table 7-2.
template <class T>
static void parse_scaling_matrices(BitReader& br, T* ps, int n_lists,
                                   const Sps* fallback_sps) {
  for (int i = 0; i < n_lists; ++i) {
    ps->scaling_list_present[i] = br.bit();
    bool use_default = false;
    if (i < 6) {
      if (ps->scaling_list_present[i]) {
        parse_scaling_list(br, ps->scaling_4x4[i], 16, &use_default);
      }
      if (!ps->scaling_list_present[i] || use_default) {
        // fall back: list 0/3 -> default intra/inter (or SPS list when PPS
        // and sps has matrix); others -> previous list
        if (i == 0 || i == 3) {
          const u8* def = (i == 0) ? kDefault4x4Intra : kDefault4x4Inter;
          if (!ps->scaling_list_present[i] && fallback_sps &&
              fallback_sps->seq_scaling_matrix_present) {
            memcpy(ps->scaling_4x4[i], fallback_sps->scaling_4x4[i], 16);
          } else {
            memcpy(ps->scaling_4x4[i], def, 16);
          }
        } else {
          memcpy(ps->scaling_4x4[i], ps->scaling_4x4[i - 1], 16);
        }
      }
    } else {
      int j = i - 6;
      if (ps->scaling_list_present[i]) {
        parse_scaling_list(br, ps->scaling_8x8[j], 64, &use_default);
      }
      if (!ps->scaling_list_present[i] || use_default) {
        if (j == 0 || j == 1) {
          const u8* def = (j == 0) ? kDefault8x8Intra : kDefault8x8Inter;
          if (!ps->scaling_list_present[i] && fallback_sps &&
              fallback_sps->seq_scaling_matrix_present) {
            memcpy(ps->scaling_8x8[j], fallback_sps->scaling_8x8[j], 64);
          } else {
            memcpy(ps->scaling_8x8[j], def, 64);
          }
        } else {
          memcpy(ps->scaling_8x8[j], ps->scaling_8x8[j - 2], 64);
        }
      }
    }
  }
}

Sps parse_sps(BitReader& br) {
  Sps s;
  s.profile_idc = br.u(8);
  s.constraint_flags = u8(br.u(8));
  s.level_idc = br.u(8);
  s.sps_id = br.ue();
  if (s.profile_idc == 100 || s.profile_idc == 110 || s.profile_idc == 122 ||
      s.profile_idc == 244 || s.profile_idc == 44 || s.profile_idc == 83 ||
      s.profile_idc == 86 || s.profile_idc == 118 || s.profile_idc == 128) {
    s.chroma_format_idc = br.ue();
    if (s.chroma_format_idc == 3) s.separate_colour_plane = br.bit();
    s.bit_depth_luma = 8 + br.ue();
    s.bit_depth_chroma = 8 + br.ue();
    s.qpprime_y_zero_transform_bypass = br.bit();
    s.seq_scaling_matrix_present = br.bit();
    if (s.seq_scaling_matrix_present) {
      parse_scaling_matrices(br, &s, s.chroma_format_idc != 3 ? 8 : 12, nullptr);
    }
  }
  s.log2_max_frame_num = 4 + br.ue();
  s.pic_order_cnt_type = br.ue();
  if (s.pic_order_cnt_type == 0) {
    s.log2_max_poc_lsb = 4 + br.ue();
  } else if (s.pic_order_cnt_type == 1) {
    s.delta_pic_order_always_zero = br.bit();
    s.offset_for_non_ref_pic = br.se();
    s.offset_for_top_to_bottom = br.se();
    int n = br.ue();
    for (int i = 0; i < n; ++i) s.offsets_for_ref_frame.push_back(br.se());
  }
  s.max_num_ref_frames = br.ue();
  s.gaps_in_frame_num_allowed = br.bit();
  s.pic_width_in_mbs = br.ue() + 1;
  s.pic_height_in_map_units = br.ue() + 1;
  s.frame_mbs_only = br.bit();
  if (!s.frame_mbs_only) s.mb_adaptive_frame_field = br.bit();
  s.direct_8x8_inference = br.bit();
  s.frame_cropping = br.bit();
  if (s.frame_cropping)
    for (int i = 0; i < 4; ++i) s.crop[i] = br.ue();
  s.vui_present = br.bit();
  // VUI is passthrough; no need to parse further (header bytes are copied
  // verbatim by the container).
  return s;
}

Pps parse_pps(BitReader& br, const std::map<int, Sps>& sps_map) {
  Pps p;
  p.pps_id = br.ue();
  p.sps_id = br.ue();
  p.entropy_coding_mode = br.bit();
  p.bottom_field_pic_order_in_frame_present = br.bit();
  p.num_slice_groups = br.ue() + 1;
  if (p.num_slice_groups > 1) {
    p.slice_group_map_type = br.ue();
    switch (p.slice_group_map_type) {
      case 0:
        for (int i = 0; i < p.num_slice_groups; ++i)
          p.run_length.push_back(br.ue() + 1);
        break;
      case 1:
        break;  // dispersed
      case 2:
        for (int i = 0; i < p.num_slice_groups - 1; ++i) {
          p.top_left.push_back(br.ue());
          p.bottom_right.push_back(br.ue());
        }
        break;
      case 3:
      case 4:
      case 5:
        p.slice_group_change_direction = br.bit();
        p.slice_group_change_rate = br.ue() + 1;
        break;
      case 6: {
        int n = br.ue() + 1;
        int bits = bit_length(u32(p.num_slice_groups - 1));
        if ((1 << bits) == p.num_slice_groups) {
        } else {
          bits = bit_length(u32(p.num_slice_groups - 1));
        }
        // spec: Ceil(Log2(num_slice_groups))
        int b = 0;
        while ((1 << b) < p.num_slice_groups) ++b;
        for (int i = 0; i < n; ++i) p.slice_group_id.push_back(br.u(b));
        break;
      }
      default:
        throw PipError("bad slice_group_map_type");
    }
  }
  p.num_ref_idx_l0_default = br.ue() + 1;
  p.num_ref_idx_l1_default = br.ue() + 1;
  p.weighted_pred = br.bit();
  p.weighted_bipred_idc = br.u(2);
  p.pic_init_qp = 26 + br.se();
  p.pic_init_qs = 26 + br.se();
  p.chroma_qp_index_offset = br.se();
  p.deblocking_filter_control_present = br.bit();
  p.constrained_intra_pred = br.bit();
  p.redundant_pic_cnt_present = br.bit();
  p.second_chroma_qp_index_offset = p.chroma_qp_index_offset;
  if (br.more_rbsp_data()) {
    p.has_ext = true;
    p.transform_8x8_mode = br.bit();
    p.pic_scaling_matrix_present = br.bit();
    if (p.pic_scaling_matrix_present) {
      auto it = sps_map.find(p.sps_id);
      const Sps* sps = it == sps_map.end() ? nullptr : &it->second;
      int chroma_fmt = sps ? sps->chroma_format_idc : 1;
      int n_lists = 6 + (p.transform_8x8_mode ? (chroma_fmt != 3 ? 2 : 6) : 0);
      parse_scaling_matrices(br, &p, n_lists, sps);
    }
    p.second_chroma_qp_index_offset = br.se();
  }
  return p;
}

static void parse_ref_pic_list_modification(BitReader& br, SliceHeader& sh) {
  if (sh.slice_type != SLICE_I && sh.slice_type != SLICE_SI) {
    sh.ref_pic_list_mod_l0 = br.bit();
    if (sh.ref_pic_list_mod_l0) {
      while (true) {
        u32 op = br.ue();
        if (op == 3) break;
        sh.rplr_l0.push_back({op, br.ue()});
      }
    }
  }
  if (sh.slice_type == SLICE_B) {
    if (br.bit()) {
      while (true) {
        u32 op = br.ue();
        if (op == 3) break;
        br.ue();
      }
    }
  }
}

static void parse_pred_weight_table(BitReader& br, SliceHeader& sh,
                                    int chroma_format_idc) {
  sh.has_pred_weights = true;
  sh.luma_log2_weight_denom = int(br.ue());
  if (chroma_format_idc != 0) sh.chroma_log2_weight_denom = int(br.ue());
  PIP_CHECK(sh.luma_log2_weight_denom < 8 && sh.chroma_log2_weight_denom < 8,
            "weight denom out of range");
  for (int list = 0; list < (sh.slice_type == SLICE_B ? 2 : 1); ++list) {
    int n = list == 0 ? sh.num_ref_idx_l0_active : sh.num_ref_idx_l1_active;
    for (int i = 0; i < n; ++i) {
      i16 lw = i16(1 << sh.luma_log2_weight_denom), lo = 0;
      if (br.bit()) {  // luma_weight_flag
        lw = i16(br.se());
        lo = i16(br.se());
      }
      i16 cw[2] = {i16(1 << sh.chroma_log2_weight_denom),
                   i16(1 << sh.chroma_log2_weight_denom)},
          co[2] = {0, 0};
      if (chroma_format_idc != 0 && br.bit()) {
        for (int j = 0; j < 2; ++j) {
          cw[j] = i16(br.se());
          co[j] = i16(br.se());
        }
      }
      if (list == 0 && i < 32) {
        sh.luma_weight[i] = lw;
        sh.luma_offset[i] = lo;
        for (int j = 0; j < 2; ++j) {
          sh.chroma_weight[i][j] = cw[j];
          sh.chroma_offset[i][j] = co[j];
        }
      }
    }
  }
}

static void parse_dec_ref_pic_marking(BitReader& br, SliceHeader& sh) {
  if (sh.is_idr) {
    sh.no_output_of_prior_pics = br.bit();
    sh.long_term_reference_flag = br.bit();
  } else {
    sh.adaptive_ref_pic_marking = br.bit();
    if (sh.adaptive_ref_pic_marking) {
      while (true) {
        u32 op = br.ue();
        if (op == 0) break;
        SliceHeader::Mmco m{op, 0, 0};
        if (op == 1 || op == 3) m.v1 = br.ue();
        if (op == 2) m.v1 = br.ue();
        if (op == 3 || op == 6) m.v2 = br.ue();
        if (op == 4) m.v1 = br.ue();
        sh.mmco.push_back(m);
      }
    }
  }
}

SliceHeader parse_slice_header(BitReader& br, int nal_ref_idc, int nal_type,
                               const std::map<int, Sps>& sps_map,
                               const std::map<int, Pps>& pps_map) {
  SliceHeader sh;
  sh.nal_ref_idc = nal_ref_idc;
  sh.nal_type = nal_type;
  sh.is_idr = (nal_type == 5);
  sh.first_mb_in_slice = br.ue();
  sh.slice_type_raw = br.ue();
  PIP_CHECK(sh.slice_type_raw <= 9, "bad slice type");
  sh.slice_type = sh.slice_type_raw % 5;
  sh.pps_id = br.ue();
  auto pit = pps_map.find(sh.pps_id);
  PIP_CHECK(pit != pps_map.end(), "slice references unknown PPS");
  const Pps& pps = pit->second;
  auto sit = sps_map.find(pps.sps_id);
  PIP_CHECK(sit != sps_map.end(), "PPS references unknown SPS");
  const Sps& sps = sit->second;
  PIP_CHECK(!sps.separate_colour_plane, "separate colour planes unsupported");
  sh.frame_num = br.u(sps.log2_max_frame_num);
  if (!sps.frame_mbs_only) {
    sh.field_pic = br.bit();
    PIP_CHECK(!sh.field_pic, "field pictures unsupported");
  }
  if (sh.is_idr) sh.idr_pic_id = br.ue();
  if (sps.pic_order_cnt_type == 0) {
    sh.poc_lsb = br.u(sps.log2_max_poc_lsb);
    if (pps.bottom_field_pic_order_in_frame_present && !sh.field_pic)
      sh.delta_poc_bottom = br.se();
  } else if (sps.pic_order_cnt_type == 1 && !sps.delta_pic_order_always_zero) {
    sh.delta_poc[0] = br.se();
    if (pps.bottom_field_pic_order_in_frame_present && !sh.field_pic)
      sh.delta_poc[1] = br.se();
  }
  if (pps.redundant_pic_cnt_present) sh.redundant_pic_cnt = br.ue();
  if (sh.slice_type == SLICE_B) sh.direct_spatial_mv_pred = br.bit();
  sh.num_ref_idx_l0_active = pps.num_ref_idx_l0_default;
  sh.num_ref_idx_l1_active = pps.num_ref_idx_l1_default;
  if (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP ||
      sh.slice_type == SLICE_B) {
    sh.num_ref_idx_override = br.bit();
    if (sh.num_ref_idx_override) {
      sh.num_ref_idx_l0_active = br.ue() + 1;
      if (sh.slice_type == SLICE_B) sh.num_ref_idx_l1_active = br.ue() + 1;
    }
  }
  parse_ref_pic_list_modification(br, sh);
  if ((pps.weighted_pred &&
       (sh.slice_type == SLICE_P || sh.slice_type == SLICE_SP)) ||
      (pps.weighted_bipred_idc == 1 && sh.slice_type == SLICE_B)) {
    parse_pred_weight_table(br, sh, sps.chroma_format_idc);
  }
  if (nal_ref_idc != 0) parse_dec_ref_pic_marking(br, sh);
  if (pps.entropy_coding_mode && sh.slice_type != SLICE_I &&
      sh.slice_type != SLICE_SI) {
    sh.cabac_init_idc = br.ue();
  }
  sh.slice_qp = pps.pic_init_qp + br.se();
  if (sh.slice_type == SLICE_SP || sh.slice_type == SLICE_SI) {
    if (sh.slice_type == SLICE_SP) sh.sp_for_switch = br.bit();
    sh.slice_qs_delta = br.se();
  }
  if (pps.deblocking_filter_control_present) {
    sh.disable_deblocking_idc = br.ue();
    if (sh.disable_deblocking_idc != 1) {
      sh.alpha_c0_offset = 2 * br.se();
      sh.beta_offset = 2 * br.se();
    }
  }
  if (pps.num_slice_groups > 1 && pps.slice_group_map_type >= 3 &&
      pps.slice_group_map_type <= 5) {
    int pic_size_in_map_units = sps.pic_width_in_mbs * sps.pic_height_in_map_units;
    int v = (pic_size_in_map_units + pps.slice_group_change_rate - 1) /
                pps.slice_group_change_rate + 1;
    int bits = 0;
    while ((1 << bits) < v) ++bits;  // Ceil(Log2(v))
    sh.slice_group_change_cycle = br.u(bits);
  }
  sh.header_bits = br.pos_bits();
  return sh;
}

// ---------------------------------------------------------------------------
// FMO slice group maps (spec 8.2.2.1-8.2.2.8)
// ---------------------------------------------------------------------------
void compute_slice_group_map(const Sps& sps, const Pps& pps,
                             const SliceHeader& sh, PicState& pic) {
  int w = sps.pic_width_in_mbs;
  int units = w * sps.pic_height_in_map_units;
  std::vector<u8>& map = pic.slice_group;
  map.assign(units, 0);
  if (pps.num_slice_groups == 1) return;
  int g = pps.num_slice_groups;
  switch (pps.slice_group_map_type) {
    case 0: {  // interleaved
      int i = 0;
      while (i < units) {
        for (int ig = 0; ig < g && i < units; ++ig) {
          for (u32 j = 0; j < pps.run_length[ig] && i < units; ++j) map[i++] = u8(ig);
        }
      }
      break;
    }
    case 1: {  // dispersed
      for (int i = 0; i < units; ++i) {
        map[i] = u8(((i % w) + (((i / w) * g) / 2)) % g);
      }
      break;
    }
    case 2: {  // foreground + leftover
      for (int i = 0; i < units; ++i) map[i] = u8(g - 1);
      for (int ig = g - 2; ig >= 0; --ig) {
        int ytl = pps.top_left[ig] / w, xtl = pps.top_left[ig] % w;
        int ybr = pps.bottom_right[ig] / w, xbr = pps.bottom_right[ig] % w;
        for (int y = ytl; y <= ybr; ++y)
          for (int x = xtl; x <= xbr; ++x)
            if (y < sps.pic_height_in_map_units && x < w) map[y * w + x] = u8(ig);
      }
      break;
    }
    case 3: {  // box-out
      int map_units_in_group =
          std::min(sh.slice_group_change_cycle * pps.slice_group_change_rate, units);
      for (int i = 0; i < units; ++i) map[i] = 1;
      int x = (w - (pps.slice_group_change_direction ? 1 : 0)) / 2;
      int y = (sps.pic_height_in_map_units - (pps.slice_group_change_direction ? 1 : 0)) / 2;
      int xmin = x, xmax = x, ymin = y, ymax = y;
      int xdir = pps.slice_group_change_direction ? 0 : -1;
      int ydir = pps.slice_group_change_direction ? -1 : 0;
      for (int k = 0; k < map_units_in_group;) {
        int mapped = (map[y * w + x] == 1);
        if (mapped) {
          map[y * w + x] = 0;
          ++k;
        }
        if (xdir == -1 && x == xmin) {
          xmin = std::max(xmin - 1, 0);
          x = xmin;
          xdir = 0;
          ydir = pps.slice_group_change_direction ? 1 : -1;
        } else if (xdir == 1 && x == xmax) {
          xmax = std::min(xmax + 1, w - 1);
          x = xmax;
          xdir = 0;
          ydir = pps.slice_group_change_direction ? -1 : 1;
        } else if (ydir == -1 && y == ymin) {
          ymin = std::max(ymin - 1, 0);
          y = ymin;
          xdir = pps.slice_group_change_direction ? -1 : 1;
          ydir = 0;
        } else if (ydir == 1 && y == ymax) {
          ymax = std::min(ymax + 1, int(sps.pic_height_in_map_units) - 1);
          y = ymax;
          xdir = pps.slice_group_change_direction ? 1 : -1;
          ydir = 0;
        } else {
          x += xdir;
          y += ydir;
        }
      }
      break;
    }
    case 4: {  // raster scan
      int size = std::min(sh.slice_group_change_cycle * pps.slice_group_change_rate, units);
      int sizeOfUpperLeftGroup = pps.slice_group_change_direction ? (units - size) : size;
      for (int i = 0; i < units; ++i) {
        if (i < sizeOfUpperLeftGroup)
          map[i] = pps.slice_group_change_direction ? 1 : 0;
        else
          map[i] = pps.slice_group_change_direction ? 0 : 1;
      }
      break;
    }
    case 5: {  // wipe
      int size = std::min(sh.slice_group_change_cycle * pps.slice_group_change_rate, units);
      int sizeOfUpperLeftGroup = pps.slice_group_change_direction ? (units - size) : size;
      int k = 0;
      for (int j = 0; j < w; ++j) {
        for (int i = 0; i < (int)sps.pic_height_in_map_units; ++i) {
          int idx = i * w + j;
          if (k++ < sizeOfUpperLeftGroup)
            map[idx] = pps.slice_group_change_direction ? 1 : 0;
          else
            map[idx] = pps.slice_group_change_direction ? 0 : 1;
        }
      }
      break;
    }
    case 6: {  // explicit
      for (int i = 0; i < units; ++i) {
        map[i] = i < (int)pps.slice_group_id.size() ? u8(pps.slice_group_id[i]) : 0;
      }
      break;
    }
    default:
      throw PipError("unsupported slice_group_map_type");
  }
}

int next_mb_address(const PicState& pic, int addr) {
  int n = pic.num_mbs();
  if (pic.slice_group.empty()) return addr + 1;
  u8 g = pic.slice_group[addr];
  int i = addr + 1;
  while (i < n && pic.slice_group[i] != g) ++i;
  return i;
}

}  // namespace h264pip
