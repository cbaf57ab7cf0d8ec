// fy_infer — zero-dependency C++ runtime for fce_yolo_tpu native exports.
//
// Executes the .fyir/.fybin artifact written by
// fce_yolo_tpu/engine/export_native.py: a serialized jaxpr of the model's
// eval forward (the same program XLA compiles), with weights baked as
// constants. End-to-end semantics mirror the reference's native examples
// (/root/reference/examples/YOLOv8-ONNXRuntime-CPP/inference.cpp:1-377):
// letterbox -> graph -> confidence filter -> greedy NMS -> scale-back.
//
// Usage:
//   fy_infer model.fyir model.fybin image.ppm [conf] [iou] [max_det]
//       prints one detection per line: x1 y1 x2 y2 score cls  (original
//       image pixel coords)
//   fy_infer model.fyir model.fybin --raw in.f32 out.f32
//       raw graph execution: reads the input tensor (f32, exported shape),
//       writes the output tensor — used by the parity test harness.
//
// Build: g++ -O2 -std=c++17 -o fy_infer fy_infer.cpp

#include <algorithm>
#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <array>
#include <fstream>
#include <map>
#include <numeric>
#include <sstream>
#include <string>
#include <vector>

using std::string;
using std::vector;

struct Tensor {
  vector<int64_t> shape;
  vector<float> data;
  int64_t size() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
};

static vector<int64_t> strides_of(const vector<int64_t>& shape) {
  vector<int64_t> s(shape.size(), 1);
  for (int i = (int)shape.size() - 2; i >= 0; --i) s[i] = s[i + 1] * shape[i + 1];
  return s;
}

struct Eqn {
  string prim;
  vector<int> ins, outs;
  std::map<string, string> params;
};

struct Graph {
  std::map<int, Tensor> consts;
  std::map<int, vector<int64_t>> shapes;  // declared output shapes per tensor id
  vector<Eqn> eqns;
  int input_id = -1;
  vector<int> output_ids;                // 1+ graph outputs, trace order
  std::map<string, string> meta;         // task=..., nc=..., kpt=... sidecar
  vector<int64_t> input_shape;
};

static vector<int64_t> parse_ints(const string& s) {
  vector<int64_t> out;
  if (s.empty() || s == "-") return out;
  std::stringstream ss(s);
  string tok;
  while (std::getline(ss, tok, ',')) out.push_back(std::stoll(tok));
  return out;
}

static vector<std::pair<int64_t, int64_t>> parse_pairs(const string& s) {
  vector<std::pair<int64_t, int64_t>> out;
  if (s.empty() || s == "-") return out;
  std::stringstream ss(s);
  string tok;
  while (std::getline(ss, tok, ';')) {
    auto c = tok.find(',');
    out.push_back({std::stoll(tok.substr(0, c)), std::stoll(tok.substr(c + 1))});
  }
  return out;
}

static Graph load_graph(const string& ir_path, const string& bin_path) {
  Graph g;
  std::ifstream blob(bin_path, std::ios::binary);
  std::ifstream ir(ir_path);
  if (!ir || !blob) { fprintf(stderr, "cannot open artifact\n"); exit(2); }
  string line;
  std::getline(ir, line);
  if (line.rfind("FYIR", 0) != 0) { fprintf(stderr, "bad magic\n"); exit(2); }
  while (std::getline(ir, line)) {
    if (line.empty()) continue;
    std::stringstream ss(line);
    string kind;
    ss >> kind;
    if (kind == "const") {
      int id, rank;
      ss >> id >> rank;
      string dims = "";
      if (rank > 0) ss >> dims;
      int64_t off, nbytes;
      ss >> off >> nbytes;
      Tensor t;
      t.shape = parse_ints(dims);
      t.data.resize(nbytes / 4);
      blob.seekg(off);
      blob.read(reinterpret_cast<char*>(t.data.data()), nbytes);
      g.consts[id] = std::move(t);
    } else if (kind == "input") {
      int id, rank;
      string dims;
      ss >> id >> rank >> dims;
      g.input_id = id;
      g.input_shape = parse_ints(dims);
    } else if (kind == "shape") {
      int id, rank;
      ss >> id >> rank;
      string dims = "";
      if (rank > 0) ss >> dims;
      g.shapes[id] = parse_ints(dims);
    } else if (kind == "eqn") {
      Eqn e;
      int nin, nout;
      ss >> e.prim >> nin;
      e.ins.resize(nin);
      for (auto& v : e.ins) ss >> v;
      ss >> nout;
      e.outs.resize(nout);
      for (auto& v : e.outs) ss >> v;
      string kv;
      while (ss >> kv) {
        auto eq = kv.find('=');
        e.params[kv.substr(0, eq)] = kv.substr(eq + 1);
      }
      g.eqns.push_back(std::move(e));
    } else if (kind == "output") {
      int id;
      ss >> id;
      g.output_ids.push_back(id);
    } else if (kind == "meta") {
      string kv;
      while (ss >> kv) {
        auto eq = kv.find('=');
        if (eq != string::npos) g.meta[kv.substr(0, eq)] = kv.substr(eq + 1);
      }
    }
  }
  return g;
}

// ---- op kernels ----------------------------------------------------------

static void binary_op(const string& p, const Tensor& a, const Tensor& b, Tensor& o) {
  auto f = [&](float x, float y) -> float {
    if (p == "add") return x + y;
    if (p == "sub") return x - y;
    if (p == "mul") return x * y;
    if (p == "div") return x / y;
    if (p == "max") return std::max(x, y);
    if (p == "min") return std::min(x, y);
    if (p == "pow") return std::pow(x, y);
    fprintf(stderr, "bad binary %s\n", p.c_str());
    exit(3);
  };
  int64_t n = o.size();
  o.data.resize(n);
  if (a.size() == n && b.size() == n) {  // fast path: same shapes
    for (int64_t i = 0; i < n; ++i) o.data[i] = f(a.data[i], b.data[i]);
    return;
  }
  // jaxprs keep degenerate-dim broadcasts implicit (e.g. (1,H,W,C) op
  // (1,1,1,C)); walk output indices with per-operand broadcast strides
  const bool sa = a.size() == 1, sb = b.size() == 1;
  auto os = strides_of(o.shape);
  auto as = strides_of(a.shape), bs = strides_of(b.shape);
  int rank = (int)o.shape.size();
  for (int64_t i = 0; i < n; ++i) {
    int64_t aoff = 0, boff = 0, rem = i;
    for (int d = 0; d < rank; ++d) {
      int64_t c = rem / os[d];
      rem %= os[d];
      if (!sa && a.shape[d] != 1) aoff += c * as[d];
      if (!sb && b.shape[d] != 1) boff += c * bs[d];
    }
    o.data[i] = f(a.data[sa ? 0 : aoff], b.data[sb ? 0 : boff]);
  }
}

static void unary_op(const string& p, const Eqn& e, const Tensor& a, Tensor& o) {
  o.data.resize(a.data.size());
  int ipow = 2;
  if (p == "integer_pow" && e.params.count("y")) ipow = std::stoi(e.params.at("y"));
  for (size_t i = 0; i < a.data.size(); ++i) {
    float x = a.data[i];
    float y;
    if (p == "logistic") y = 1.f / (1.f + std::exp(-x));
    else if (p == "exp") y = std::exp(x);
    else if (p == "log") y = std::log(x);
    else if (p == "tanh") y = std::tanh(x);
    else if (p == "rsqrt") y = 1.f / std::sqrt(x);
    else if (p == "sqrt") y = std::sqrt(x);
    else if (p == "neg") y = -x;
    else if (p == "sign") y = (x > 0) - (x < 0);
    else if (p == "erf") y = std::erf(x);
    else if (p == "floor") y = std::floor(x);
    else if (p == "abs") y = std::fabs(x);
    else if (p == "integer_pow") { y = 1; for (int k = 0; k < ipow; ++k) y *= x; }
    else y = x;  // stop_gradient / convert_element_type / copy
    o.data[i] = y;
  }
}

static void conv_op(const Eqn& e, const Tensor& lhs, const Tensor& rhs, Tensor& out) {
  auto strides = parse_ints(e.params.at("strides"));
  auto pad = parse_pairs(e.params.at("pad"));
  auto lhs_dil = parse_ints(e.params.at("lhs_dil"));
  auto rhs_dil = parse_ints(e.params.at("rhs_dil"));
  int groups = std::stoi(e.params.at("groups"));
  const string& ls = e.params.at("lhs_spec");  // digits: batch, feature, spatial...
  const string& rs = e.params.at("rhs_spec");  // out_feature, in_feature, spatial...
  const string& os = e.params.at("out_spec");
  int lb = ls[0] - '0', lf = ls[1] - '0', lh = ls[2] - '0', lw = ls[3] - '0';
  int ro = rs[0] - '0', ri = rs[1] - '0', rh = rs[2] - '0', rw = rs[3] - '0';
  int ob = os[0] - '0', of = os[1] - '0', oh = os[2] - '0', ow = os[3] - '0';

  int64_t N = lhs.shape[lb], Cin = lhs.shape[lf], H = lhs.shape[lh], W = lhs.shape[lw];
  int64_t Cout = rhs.shape[ro], Kin = rhs.shape[ri], KH = rhs.shape[rh], KW = rhs.shape[rw];
  int64_t OH = out.shape[oh], OW = out.shape[ow];
  (void)Kin;
  auto lstr = strides_of(lhs.shape), rstr = strides_of(rhs.shape), ostr = strides_of(out.shape);
  out.data.assign(out.size(), 0.f);
  int64_t cin_g = Cin / groups, cout_g = Cout / groups;
  // lhs_dilation > 1 = transposed conv (Proto upsample): the input grid is
  // logically zero-interleaved; only taps landing on real elements contribute
  int64_t ldh = lhs_dil[0], ldw = lhs_dil[1];
  for (int64_t n = 0; n < N; ++n)
    for (int64_t g = 0; g < groups; ++g)
      for (int64_t co = g * cout_g; co < (g + 1) * cout_g; ++co)
        for (int64_t y = 0; y < OH; ++y)
          for (int64_t x = 0; x < OW; ++x) {
            float acc = 0.f;
            for (int64_t kh = 0; kh < KH; ++kh) {
              int64_t iy = y * strides[0] + kh * rhs_dil[0] - pad[0].first;
              if (iy % ldh != 0) continue;
              iy /= ldh;
              if (iy < 0 || iy >= H) continue;
              for (int64_t kw = 0; kw < KW; ++kw) {
                int64_t ix = x * strides[1] + kw * rhs_dil[1] - pad[1].first;
                if (ix % ldw != 0) continue;
                ix /= ldw;
                if (ix < 0 || ix >= W) continue;
                for (int64_t ci = 0; ci < cin_g; ++ci) {
                  float lv = lhs.data[n * lstr[lb] + (g * cin_g + ci) * lstr[lf] +
                                      iy * lstr[lh] + ix * lstr[lw]];
                  float rv = rhs.data[co * rstr[ro] + ci * rstr[ri] +
                                      kh * rstr[rh] + kw * rstr[rw]];
                  acc += lv * rv;
                }
              }
            }
            out.data[n * ostr[ob] + co * ostr[of] + y * ostr[oh] + x * ostr[ow]] = acc;
          }
}

static void dot_general_op(const Eqn& e, const Tensor& a, const Tensor& b, Tensor& o) {
  auto lc = parse_ints(e.params.at("lc")), rc = parse_ints(e.params.at("rc"));
  auto lbd = parse_ints(e.params.at("lb")), rbd = parse_ints(e.params.at("rb"));
  // free dims = all dims not in contract/batch, in order
  auto free_dims = [](const Tensor& t, const vector<int64_t>& c, const vector<int64_t>& bd) {
    vector<int64_t> f;
    for (int64_t d = 0; d < (int64_t)t.shape.size(); ++d)
      if (std::find(c.begin(), c.end(), d) == c.end() &&
          std::find(bd.begin(), bd.end(), d) == bd.end())
        f.push_back(d);
    return f;
  };
  auto lf = free_dims(a, lc, lbd), rf = free_dims(b, rc, rbd);
  auto as = strides_of(a.shape), bs = strides_of(b.shape);
  int64_t nbatch = 1, nlf = 1, nrf = 1, nctr = 1;
  for (auto d : lbd) nbatch *= a.shape[d];
  for (auto d : lf) nlf *= a.shape[d];
  for (auto d : rf) nrf *= b.shape[d];
  for (auto d : lc) nctr *= a.shape[d];
  o.data.assign(o.size(), 0.f);

  auto unravel = [](int64_t idx, const Tensor& t, const vector<int64_t>& dims,
                    const vector<int64_t>& str) {
    int64_t off = 0;
    for (int64_t i = (int64_t)dims.size() - 1; i >= 0; --i) {
      int64_t d = dims[i];
      off += (idx % t.shape[d]) * str[d];
      idx /= t.shape[d];
    }
    return off;
  };
  int64_t oidx = 0;
  for (int64_t bi = 0; bi < nbatch; ++bi) {
    int64_t aoff_b = unravel(bi, a, lbd, as);
    int64_t boff_b = unravel(bi, b, rbd, bs);
    for (int64_t i = 0; i < nlf; ++i) {
      int64_t aoff_i = unravel(i, a, lf, as);
      for (int64_t j = 0; j < nrf; ++j) {
        int64_t boff_j = unravel(j, b, rf, bs);
        float acc = 0.f;
        for (int64_t k = 0; k < nctr; ++k) {
          int64_t aoff_k = unravel(k, a, lc, as);
          int64_t boff_k = unravel(k, b, rc, bs);
          acc += a.data[aoff_b + aoff_i + aoff_k] * b.data[boff_b + boff_j + boff_k];
        }
        o.data[oidx++] = acc;
      }
    }
  }
}

static void transpose_op(const Eqn& e, const Tensor& a, Tensor& o) {
  auto perm = parse_ints(e.params.at("perm"));
  auto as = strides_of(a.shape), os = strides_of(o.shape);
  int64_t n = o.size();
  o.data.resize(n);
  int rank = (int)o.shape.size();
  for (int64_t i = 0; i < n; ++i) {
    int64_t rem = i, aoff = 0;
    for (int d = 0; d < rank; ++d) {
      int64_t c = rem / os[d];
      rem %= os[d];
      aoff += c * as[perm[d]];
    }
    o.data[i] = a.data[aoff];
  }
}

static void slice_op(const Eqn& e, const Tensor& a, Tensor& o) {
  auto start = parse_ints(e.params.at("start"));
  auto stride = parse_ints(e.params.at("stride"));
  auto as = strides_of(a.shape), os = strides_of(o.shape);
  int64_t n = o.size();
  o.data.resize(n);
  int rank = (int)o.shape.size();
  for (int64_t i = 0; i < n; ++i) {
    int64_t rem = i, aoff = 0;
    for (int d = 0; d < rank; ++d) {
      int64_t c = rem / os[d];
      rem %= os[d];
      aoff += (start[d] + c * stride[d]) * as[d];
    }
    o.data[i] = a.data[aoff];
  }
}

static void concat_op(const Eqn& e, const vector<const Tensor*>& ins, Tensor& o) {
  int dim = std::stoi(e.params.at("dim"));
  int64_t outer = 1, inner = 1;
  for (int d = 0; d < dim; ++d) outer *= o.shape[d];
  for (size_t d = dim + 1; d < o.shape.size(); ++d) inner *= o.shape[d];
  o.data.resize(o.size());
  int64_t dst_axis = o.shape[dim];
  int64_t axis_off = 0;
  for (auto* t : ins) {
    int64_t ta = t->shape[dim];
    for (int64_t u = 0; u < outer; ++u)
      std::memcpy(&o.data[(u * dst_axis + axis_off) * inner],
                  &t->data[u * ta * inner], sizeof(float) * ta * inner);
    axis_off += ta;
  }
}

static void broadcast_op(const Eqn& e, const Tensor& a, Tensor& o) {
  auto bdims = parse_ints(e.params.at("bdims"));
  auto as = strides_of(a.shape), os = strides_of(o.shape);
  int64_t n = o.size();
  o.data.resize(n);
  int rank = (int)o.shape.size();
  for (int64_t i = 0; i < n; ++i) {
    int64_t rem = i, aoff = 0;
    for (int d = 0; d < rank; ++d) {
      int64_t c = rem / os[d];
      rem %= os[d];
      auto it = std::find(bdims.begin(), bdims.end(), d);
      if (it != bdims.end()) {
        int ad = (int)(it - bdims.begin());
        if (a.shape[ad] != 1) aoff += c * as[ad];
      }
    }
    o.data[i] = a.data[aoff];
  }
}

static void reduce_op(const Eqn& e, const string& p, const Tensor& a, Tensor& o) {
  auto axes = parse_ints(e.params.at("axes"));
  auto as = strides_of(a.shape);
  bool is_max = p == "reduce_max";
  o.data.assign(o.size(), is_max ? -INFINITY : 0.f);
  // iterate input; accumulate into output index (dropped axes)
  vector<int64_t> keep;
  for (int64_t d = 0; d < (int64_t)a.shape.size(); ++d)
    if (std::find(axes.begin(), axes.end(), d) == axes.end()) keep.push_back(d);
  auto os = strides_of(o.shape);
  int64_t n = a.size();
  for (int64_t i = 0; i < n; ++i) {
    int64_t rem = i, ooff = 0;
    for (size_t kd = 0; kd < keep.size(); ++kd) {
      int64_t d = keep[kd];
      ooff += ((i / as[d]) % a.shape[d]) * os[kd];
    }
    (void)rem;
    if (is_max) o.data[ooff] = std::max(o.data[ooff], a.data[i]);
    else o.data[ooff] += a.data[i];
  }
}

static void reduce_window_op(const Eqn& e, const string& p, const Tensor& a, Tensor& o) {
  auto win = parse_ints(e.params.at("win"));
  auto strides = parse_ints(e.params.at("strides"));
  auto pad = parse_pairs(e.params.at("pad"));
  bool is_max = p == "reduce_window_max";
  auto as = strides_of(a.shape), os = strides_of(o.shape);
  int rank = (int)a.shape.size();
  int64_t n = o.size();
  o.data.assign(n, is_max ? -INFINITY : 0.f);
  vector<int64_t> oc(rank), wc(rank);
  for (int64_t i = 0; i < n; ++i) {
    int64_t rem = i;
    for (int d = 0; d < rank; ++d) { oc[d] = rem / os[d]; rem %= os[d]; }
    float acc = is_max ? -INFINITY : 0.f;
    std::fill(wc.begin(), wc.end(), 0);
    while (true) {
      int64_t aoff = 0;
      bool ok = true;
      for (int d = 0; d < rank; ++d) {
        int64_t c = oc[d] * strides[d] + wc[d] - pad[d].first;
        if (c < 0 || c >= a.shape[d]) { ok = false; break; }
        aoff += c * as[d];
      }
      if (ok) acc = is_max ? std::max(acc, a.data[aoff]) : acc + a.data[aoff];
      int d = rank - 1;
      for (; d >= 0; --d) {
        if (++wc[d] < win[d]) break;
        wc[d] = 0;
      }
      if (d < 0) break;
    }
    o.data[i] = acc;
  }
}

static void pad_op(const Eqn& e, const Tensor& a, const Tensor& val, Tensor& o) {
  // cfg entries: lo,hi,interior per dim
  vector<std::array<int64_t, 3>> cfg;
  {
    std::stringstream ss(e.params.at("cfg"));
    string tok;
    while (std::getline(ss, tok, ';')) {
      auto c1 = tok.find(','), c2 = tok.find(',', c1 + 1);
      cfg.push_back(std::array<int64_t, 3>{std::stoll(tok.substr(0, c1)),
                                           std::stoll(tok.substr(c1 + 1, c2 - c1 - 1)),
                                           std::stoll(tok.substr(c2 + 1))});
    }
  }
  auto as = strides_of(a.shape), os = strides_of(o.shape);
  o.data.assign(o.size(), val.data[0]);
  int rank = (int)a.shape.size();
  int64_t n = a.size();
  for (int64_t i = 0; i < n; ++i) {
    int64_t ooff = 0;
    bool ok = true;
    for (int d = 0; d < rank; ++d) {
      int64_t c = (i / as[d]) % a.shape[d];
      int64_t oc = cfg[d][0] + c * (cfg[d][2] + 1);
      if (oc < 0 || oc >= o.shape[d]) { ok = false; break; }
      ooff += oc * os[d];
    }
    if (ok) o.data[ooff] = a.data[i];
  }
}

static void run_graph(Graph& g, const Tensor& input, vector<Tensor>& outputs) {
  std::map<int, Tensor> env;
  env[g.input_id] = input;
  auto get = [&](int id) -> const Tensor& {
    auto it = env.find(id);
    if (it != env.end()) return it->second;
    return g.consts.at(id);
  };
  for (auto& e : g.eqns) {
    // allocate outputs with declared shapes
    for (int oid : e.outs) {
      Tensor t;
      t.shape = g.shapes.at(oid);
      env[oid] = std::move(t);
    }
    const string& p = e.prim;
    if (p == "add" || p == "sub" || p == "mul" || p == "div" || p == "max" ||
        p == "min" || p == "pow")
      binary_op(p, get(e.ins[0]), get(e.ins[1]), env[e.outs[0]]);
    else if (p == "conv_general_dilated")
      conv_op(e, get(e.ins[0]), get(e.ins[1]), env[e.outs[0]]);
    else if (p == "dot_general")
      dot_general_op(e, get(e.ins[0]), get(e.ins[1]), env[e.outs[0]]);
    else if (p == "reshape" || p == "squeeze" || p == "expand_dims") {
      env[e.outs[0]].data = get(e.ins[0]).data;
    } else if (p == "transpose")
      transpose_op(e, get(e.ins[0]), env[e.outs[0]]);
    else if (p == "slice")
      slice_op(e, get(e.ins[0]), env[e.outs[0]]);
    else if (p == "concatenate") {
      vector<const Tensor*> ins;
      for (int id : e.ins) ins.push_back(&get(id));
      concat_op(e, ins, env[e.outs[0]]);
    } else if (p == "broadcast_in_dim")
      broadcast_op(e, get(e.ins[0]), env[e.outs[0]]);
    else if (p == "reduce_sum" || p == "reduce_max")
      reduce_op(e, p, get(e.ins[0]), env[e.outs[0]]);
    else if (p == "reduce_window_max" || p == "reduce_window_sum")
      reduce_window_op(e, p, get(e.ins[0]), env[e.outs[0]]);
    else if (p == "iota") {
      Tensor& o = env[e.outs[0]];
      int dim = std::stoi(e.params.at("dim"));
      auto os = strides_of(o.shape);
      int64_t n = o.size();
      o.data.resize(n);
      for (int64_t i = 0; i < n; ++i) o.data[i] = (float)((i / os[dim]) % o.shape[dim]);
    } else if (p == "split") {
      auto sizes = parse_ints(e.params.at("sizes"));
      int axis = std::stoi(e.params.at("axis"));
      const Tensor& a = get(e.ins[0]);
      int64_t outer = 1, inner = 1;
      for (int d = 0; d < axis; ++d) outer *= a.shape[d];
      for (size_t d = axis + 1; d < a.shape.size(); ++d) inner *= a.shape[d];
      int64_t src_axis = a.shape[axis], off = 0;
      for (size_t s = 0; s < sizes.size(); ++s) {
        Tensor& o = env[e.outs[s]];
        o.data.resize(o.size());
        for (int64_t u = 0; u < outer; ++u)
          std::memcpy(&o.data[u * sizes[s] * inner],
                      &a.data[(u * src_axis + off) * inner],
                      sizeof(float) * sizes[s] * inner);
        off += sizes[s];
      }
    } else if (p == "pad")
      pad_op(e, get(e.ins[0]), get(e.ins[1]), env[e.outs[0]]);
    else if (p == "select_n") {
      const Tensor& c = get(e.ins[0]);
      Tensor& o = env[e.outs[0]];
      o.data.resize(o.size());
      for (int64_t i = 0; i < (int64_t)o.data.size(); ++i) {
        int which = (int)c.data[c.size() == 1 ? 0 : i];
        const Tensor& src = get(e.ins[1 + which]);
        o.data[i] = src.data[src.size() == 1 ? 0 : i];
      }
    } else if (p == "rev") {
      auto dims = parse_ints(e.params.at("dims"));
      const Tensor& a = get(e.ins[0]);
      Tensor& o = env[e.outs[0]];
      auto as = strides_of(a.shape);
      int64_t n = o.size();
      o.data.resize(n);
      int rank = (int)a.shape.size();
      for (int64_t i = 0; i < n; ++i) {
        int64_t aoff = 0;
        for (int d = 0; d < rank; ++d) {
          int64_t c = (i / as[d]) % a.shape[d];
          if (std::find(dims.begin(), dims.end(), (int64_t)d) != dims.end())
            c = a.shape[d] - 1 - c;
          aoff += c * as[d];
        }
        o.data[i] = a.data[aoff];
      }
    } else {  // unary family
      unary_op(p, e, get(e.ins[0]), env[e.outs[0]]);
    }
  }
  outputs.clear();
  for (int id : g.output_ids) outputs.push_back(env.at(id));
}

// half-pixel-center bilinear resample of one (sh, sw) float plane into
// (dh, dw) — the same sampling rule as cv2 INTER_LINEAR and
// jax.image.resize(method="bilinear"), matching both halves of the Python
// mask pipeline (ops/masks.py process_mask + scale_masks_np).
static void bilinear_plane(const float* src, int sh, int sw, float* dst,
                           int dh, int dw) {
  for (int y = 0; y < dh; ++y) {
    float sy = (y + 0.5f) * sh / dh - 0.5f;
    int y0 = (int)std::floor(sy);
    float fy = sy - y0;
    int y0c = std::clamp(y0, 0, sh - 1), y1c = std::clamp(y0 + 1, 0, sh - 1);
    for (int x = 0; x < dw; ++x) {
      float sx = (x + 0.5f) * sw / dw - 0.5f;
      int x0 = (int)std::floor(sx);
      float fx = sx - x0;
      int x0c = std::clamp(x0, 0, sw - 1), x1c = std::clamp(x0 + 1, 0, sw - 1);
      dst[(size_t)y * dw + x] =
          src[(size_t)y0c * sw + x0c] * (1 - fy) * (1 - fx) +
          src[(size_t)y0c * sw + x1c] * (1 - fy) * fx +
          src[(size_t)y1c * sw + x0c] * fy * (1 - fx) +
          src[(size_t)y1c * sw + x1c] * fy * fx;
    }
  }
}

// ---- image pipeline ------------------------------------------------------

struct Image {
  int w = 0, h = 0;
  vector<uint8_t> rgb;  // HWC
};

static Image load_ppm(const string& path) {
  std::ifstream f(path, std::ios::binary);
  string magic;
  f >> magic;
  if (magic != "P6") { fprintf(stderr, "expected binary PPM (P6)\n"); exit(2); }
  auto skip_ws = [&]() {
    while (isspace(f.peek())) f.get();
    while (f.peek() == '#') { string c; std::getline(f, c); while (isspace(f.peek())) f.get(); }
  };
  Image im;
  int maxv;
  skip_ws(); f >> im.w;
  skip_ws(); f >> im.h;
  skip_ws(); f >> maxv;
  f.get();
  im.rgb.resize((size_t)im.w * im.h * 3);
  f.read(reinterpret_cast<char*>(im.rgb.data()), im.rgb.size());
  return im;
}

// letterbox (reference augment.py:1509-1675 semantics; matches
// fce_yolo_tpu/data/augment.py letterbox): aspect resize + centered 114 pad
static Tensor letterbox(const Image& im, int size, float& ratio, float& padw, float& padh) {
  float r = std::min((float)size / im.h, (float)size / im.w);
  r = std::min(r, 1.0f);  // scaleup=False in predict
  int nw = (int)std::lround(im.w * r), nh = (int)std::lround(im.h * r);
  float dw = (size - nw) / 2.0f, dh = (size - nh) / 2.0f;
  int left = (int)std::lround(dw - 0.1), top = (int)std::lround(dh - 0.1);
  // return the float half-pads like the Python letterbox (data/augment.py:86)
  // — box/kpt/mask scale-back uses these, not the rounded pixel offsets
  ratio = r; padw = dw; padh = dh;

  Tensor t;
  t.shape = {1, size, size, 3};
  t.data.assign((size_t)size * size * 3, 114.f / 255.f);
  // bilinear resize with half-pixel centers (cv2 INTER_LINEAR semantics)
  for (int y = 0; y < nh; ++y) {
    float sy = (y + 0.5f) * im.h / nh - 0.5f;
    int y0 = (int)std::floor(sy);
    float fy = sy - y0;
    int y0c = std::clamp(y0, 0, im.h - 1), y1c = std::clamp(y0 + 1, 0, im.h - 1);
    for (int x = 0; x < nw; ++x) {
      float sx = (x + 0.5f) * im.w / nw - 0.5f;
      int x0 = (int)std::floor(sx);
      float fx = sx - x0;
      int x0c = std::clamp(x0, 0, im.w - 1), x1c = std::clamp(x0 + 1, 0, im.w - 1);
      for (int c = 0; c < 3; ++c) {
        float v00 = im.rgb[((size_t)y0c * im.w + x0c) * 3 + c];
        float v01 = im.rgb[((size_t)y0c * im.w + x1c) * 3 + c];
        float v10 = im.rgb[((size_t)y1c * im.w + x0c) * 3 + c];
        float v11 = im.rgb[((size_t)y1c * im.w + x1c) * 3 + c];
        float v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                  v10 * fy * (1 - fx) + v11 * fy * fx;
        t.data[(((size_t)(y + top) * size) + (x + left)) * 3 + c] = v / 255.f;
      }
    }
  }
  return t;
}

struct Det {
  float x1, y1, x2, y2, score;
  int cls;
  int64_t anchor;  // source row — indexes mask coefs / keypoint tails
};

// single-label greedy NMS (predict config, reference nms.py:13-166).
// `row_len` is the full per-anchor row (4 + nc + task extras); extras are
// ignored for scoring but reachable later through Det::anchor.
static vector<Det> nms(const vector<float>& preds, int64_t n_anchors, int nc,
                       int row_len, float conf, float iou_thr, int max_det) {
  vector<Det> cand;
  for (int64_t i = 0; i < n_anchors; ++i) {
    const float* row = &preds[i * row_len];
    int best = 0;
    for (int c = 1; c < nc; ++c)
      if (row[4 + c] > row[4 + best]) best = c;
    float s = row[4 + best];
    if (s <= conf) continue;
    float cx = row[0], cy = row[1], w = row[2], h = row[3];
    cand.push_back({cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2, s, best, i});
  }
  std::stable_sort(cand.begin(), cand.end(),
                   [](const Det& a, const Det& b) { return a.score > b.score; });
  vector<Det> keep;
  vector<bool> dead(cand.size(), false);
  for (size_t i = 0; i < cand.size() && (int)keep.size() < max_det; ++i) {
    if (dead[i]) continue;
    keep.push_back(cand[i]);
    for (size_t j = i + 1; j < cand.size(); ++j) {
      if (dead[j] || cand[j].cls != cand[i].cls) continue;
      float xx1 = std::max(cand[i].x1, cand[j].x1), yy1 = std::max(cand[i].y1, cand[j].y1);
      float xx2 = std::min(cand[i].x2, cand[j].x2), yy2 = std::min(cand[i].y2, cand[j].y2);
      float iw = std::max(0.f, xx2 - xx1), ih = std::max(0.f, yy2 - yy1);
      float inter = iw * ih;
      float ai = (cand[i].x2 - cand[i].x1) * (cand[i].y2 - cand[i].y1);
      float aj = (cand[j].x2 - cand[j].x1) * (cand[j].y2 - cand[j].y1);
      if (inter / (ai + aj - inter + 1e-7f) > iou_thr) dead[j] = true;
    }
  }
  return keep;
}

// segment: per-detection binary mask at original resolution, mirroring the
// Python pipeline exactly (ops/masks.py process_mask upsample=True ->
// scale_masks_np): sigmoid(coefs . protos) -> crop at proto res -> bilinear
// to net input -> >0.5 -> strip letterbox pad -> bilinear to original -> >0.
static vector<uint8_t> detection_mask(const Det& d, const Tensor& preds,
                                      const Tensor& proto, int nc, int size,
                                      const Image& im, float padw, float padh) {
  int hp = (int)proto.shape[1], wp = (int)proto.shape[2], nm = (int)proto.shape[3];
  int row_len = (int)preds.shape[2];
  const float* coef = &preds.data[d.anchor * row_len + 4 + nc];
  vector<float> lo((size_t)hp * wp);
  float sx = (float)wp / size, sy = (float)hp / size;
  float bx1 = d.x1 * sx, bx2 = d.x2 * sx, by1 = d.y1 * sy, by2 = d.y2 * sy;
  for (int y = 0; y < hp; ++y)
    for (int x = 0; x < wp; ++x) {
      bool inside = x >= bx1 && x < bx2 && y >= by1 && y < by2;
      if (!inside) { lo[(size_t)y * wp + x] = 0.f; continue; }
      const float* p = &proto.data[((size_t)y * wp + x) * nm];
      float s = 0.f;
      for (int k = 0; k < nm; ++k) s += coef[k] * p[k];
      lo[(size_t)y * wp + x] = 1.f / (1.f + std::exp(-s));
    }
  vector<float> hi((size_t)size * size);
  bilinear_plane(lo.data(), hp, wp, hi.data(), size, size);
  // binarize at net-input resolution, then strip the letterbox pad.
  // Python's scale_masks_np uses round-half-even (int(round(ph)))
  auto pyround = [](float v) {
    float fl = std::floor(v);
    float fr = v - fl;
    if (fr > 0.5f) return (int)fl + 1;
    if (fr < 0.5f) return (int)fl;
    return (int)fl % 2 == 0 ? (int)fl : (int)fl + 1;
  };
  int top = pyround(padh), left = pyround(padw);
  int ch = size - 2 * top, cw = size - 2 * left;
  vector<float> crop((size_t)std::max(ch, 0) * std::max(cw, 0));
  for (int y = 0; y < ch; ++y)
    for (int x = 0; x < cw; ++x)
      crop[(size_t)y * cw + x] = hi[(size_t)(y + top) * size + (x + left)] > 0.5f;
  vector<float> full((size_t)im.h * im.w);
  if (!crop.empty()) bilinear_plane(crop.data(), ch, cw, full.data(), im.h, im.w);
  vector<uint8_t> out((size_t)im.h * im.w);
  for (size_t i = 0; i < out.size(); ++i) out[i] = full[i] > 0.f ? 255 : 0;
  return out;
}

static void write_pgm(const string& path, const vector<uint8_t>& px, int w, int h) {
  std::ofstream f(path, std::ios::binary);
  f << "P5\n" << w << " " << h << "\n255\n";
  f.write(reinterpret_cast<const char*>(px.data()), px.size());
}

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: %s model.fyir model.fybin (image.ppm [conf iou max_det [mask_prefix]] | --raw in.f32 out.f32)\n"
            "  detect:   x1 y1 x2 y2 score cls            (original pixel coords)\n"
            "  segment:  ... area_px  [+ mask_prefix_%%03d.pgm per detection]\n"
            "  pose:     ... kx ky [kv] per keypoint      (original pixel coords)\n"
            "  classify: cls prob                         (top-5)\n",
            argv[0]);
    return 2;
  }
  Graph g = load_graph(argv[1], argv[2]);
  string task = g.meta.count("task") ? g.meta.at("task") : "detect";

  if (string(argv[3]) == "--raw") {
    Tensor in;
    in.shape = g.input_shape;
    in.data.resize(in.size());
    std::ifstream f(argv[4], std::ios::binary);
    f.read(reinterpret_cast<char*>(in.data.data()), in.data.size() * 4);
    vector<Tensor> outs;
    run_graph(g, in, outs);
    // output 0 goes to out.f32 (original contract); extras to out.f32.1, ...
    for (size_t k = 0; k < outs.size(); ++k) {
      string path = argv[5];
      if (k) path += "." + std::to_string(k);
      std::ofstream of(path, std::ios::binary);
      of.write(reinterpret_cast<const char*>(outs[k].data.data()),
               outs[k].data.size() * 4);
    }
    fprintf(stderr, "raw out shape:");
    for (auto d : outs[0].shape) fprintf(stderr, " %lld", (long long)d);
    fprintf(stderr, "\n");
    return 0;
  }

  float conf = argc > 4 ? std::stof(argv[4]) : 0.25f;
  float iou = argc > 5 ? std::stof(argv[5]) : 0.7f;
  int max_det = argc > 6 ? std::stoi(argv[6]) : 300;
  string mask_prefix = argc > 7 ? argv[7] : "";
  int size = (int)g.input_shape[1];
  Image im = load_ppm(argv[3]);

  if (task == "classify") {
    // framework classify convention (engine/predictor.py _predict_classify +
    // data/classify.py val_transform): shorter side -> size, center crop,
    // color order as-loaded by cv2 (BGR) — so swap the PPM's RGB
    float r = (float)size / std::min(im.h, im.w);
    int rw = std::max(size, (int)std::lround(im.w * r));
    int rh = std::max(size, (int)std::lround(im.h * r));
    vector<float> plane((size_t)rh * rw), src((size_t)im.h * im.w);
    Tensor in;
    in.shape = {1, size, size, 3};
    in.data.resize((size_t)size * size * 3);
    int y0 = (rh - size) / 2, x0 = (rw - size) / 2;
    for (int c = 0; c < 3; ++c) {
      for (int i = 0; i < im.h * im.w; ++i) src[i] = im.rgb[(size_t)i * 3 + c];
      bilinear_plane(src.data(), im.h, im.w, plane.data(), rh, rw);
      for (int y = 0; y < size; ++y)
        for (int x = 0; x < size; ++x)
          in.data[((size_t)y * size + x) * 3 + (2 - c)] =  // RGB -> BGR
              plane[(size_t)(y + y0) * rw + (x + x0)] / 255.f;
    }
    vector<Tensor> outs;
    run_graph(g, in, outs);
    const Tensor& probs = outs[0];
    int nc = (int)probs.shape.back();
    vector<int> order(nc);
    std::iota(order.begin(), order.end(), 0);
    std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
      return probs.data[a] > probs.data[b];
    });
    for (int k = 0; k < std::min(5, nc); ++k)
      printf("%d %.5f\n", order[k], probs.data[order[k]]);
    return 0;
  }

  float ratio, padw, padh;
  Tensor in = letterbox(im, size, ratio, padw, padh);
  vector<Tensor> outs;
  run_graph(g, in, outs);
  const Tensor& preds = outs[0];
  int64_t n_anchors = preds.shape[1];
  int row_len = (int)preds.shape[2];
  int nc = g.meta.count("nc") ? std::stoi(g.meta.at("nc")) : row_len - 4;
  auto dets = nms(preds.data, n_anchors, nc, row_len, conf, iou, max_det);
  int kdim = 0;
  if (task == "pose") {
    int extra = row_len - 4 - nc;
    kdim = extra % 3 == 0 ? 3 : 2;  // (x, y[, visibility]) per keypoint
  }
  int mask_idx = 0;
  for (auto& d : dets) {
    float x1 = std::clamp((d.x1 - padw) / ratio, 0.f, (float)im.w);
    float y1 = std::clamp((d.y1 - padh) / ratio, 0.f, (float)im.h);
    float x2 = std::clamp((d.x2 - padw) / ratio, 0.f, (float)im.w);
    float y2 = std::clamp((d.y2 - padh) / ratio, 0.f, (float)im.h);
    // score at 7 decimals: near-tied anchors stay distinguishable downstream
    printf("%.3f %.3f %.3f %.3f %.7f %d", x1, y1, x2, y2, d.score, d.cls);
    if (task == "pose") {
      const float* row = &preds.data[d.anchor * row_len + 4 + nc];
      int nk = (row_len - 4 - nc) / kdim;
      for (int k = 0; k < nk; ++k) {
        printf(" %.3f %.3f", (row[k * kdim] - padw) / ratio,
               (row[k * kdim + 1] - padh) / ratio);
        if (kdim == 3) printf(" %.5f", row[k * kdim + 2]);
      }
    } else if (task == "segment" && outs.size() > 1) {
      auto mask = detection_mask(d, preds, outs[1], nc, size, im, padw, padh);
      int64_t area = 0;
      for (auto v : mask) area += v ? 1 : 0;
      printf(" %lld", (long long)area);
      if (!mask_prefix.empty()) {
        char buf[16];
        snprintf(buf, sizeof buf, "_%03d.pgm", mask_idx++);
        write_pgm(mask_prefix + buf, mask, im.w, im.h);
      }
    }
    printf("\n");
  }
  return 0;
}
