// Native TPU serving runner: C++ host pipeline around a PJRT-compiled
// StableHLO artifact.
//
// This is the TPU-native analog of the reference's TensorRT C++ deployment
// (reference: deploy/TensorRT/yolov6.cpp — engine deserialize, static_resize
// letterbox :51-62, doInference :392, generate_yolo_proposals :157,
// nms_sorted_bboxes :122, draw+save): load an exported model artifact, run
// the accelerator through a C API, and do image prep / suppression / drawing
// in native code. Here the "engine" is a StableHLO bytecode module produced
// by `tools/export.py --runner-dir`, and the accelerator interface is the
// PJRT C API (pjrt_c_api.h), so the same binary drives any PJRT plugin —
// libtpu/axon for TPU, or a CPU plugin.
//
// Usage:
//   pjrt_runner --artifact DIR [--image in.ppm] [--out out.ppm]
//               [--plugin /opt/axon/libaxon_pjrt.so] [--loops N]
//   pjrt_runner --artifact DIR --image-dir DIR [--threads N]
//
// --image-dir is the batched serving mode: JPEGs are decoded + letterboxed
// by the native thread pool (dataload.cc), the next batch is staged while
// the current one executes, and per-image detections print as each batch
// completes — the C++ throughput-serving analog of the reference's
// `trtexec`-style batch path.
//
// The artifact directory contains module.stablehlo.bc, compile_options.pb
// and manifest.json (see yolov6_tpu/models/end2end.py:write_native_artifact).
// Images are binary PPM (P6); detections print to stdout and optionally
// render into --out.
//
// Build: make -C yolov6_tpu/native pjrt_runner

#include <dirent.h>
#include <dlfcn.h>
#include <unistd.h>

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include "tensorflow/compiler/xla/pjrt/c/pjrt_c_api.h"

extern "C" {
float yolov6_letterbox(const uint8_t*, int, int, uint8_t*, int, int, int,
                       uint8_t, int*, int*);
int yolov6_nms(const float*, int, float, int, int, int*);
int yolov6_decode_jpeg_file(const char*, uint8_t*, long, int*, int*, long);
int yolov6_batch_decode_letterbox(const char**, int, uint8_t*, int, int, int,
                                  uint8_t, float*, int*, int*, int);
}

namespace {

// ───────────────────────── error plumbing ─────────────────────────

[[noreturn]] void Fail(const std::string& msg) {
  std::fprintf(stderr, "pjrt_runner: %s\n", msg.c_str());
  std::exit(1);
}

void Check(const PJRT_Api* api, PJRT_Error* err, const char* what) {
  if (!err) return;
  PJRT_Error_Message_Args ma;
  std::memset(&ma, 0, sizeof ma);
  ma.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  ma.error = err;
  api->PJRT_Error_Message(&ma);
  std::string msg(ma.message, ma.message_size);
  PJRT_Error_Destroy_Args da;
  std::memset(&da, 0, sizeof da);
  da.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  da.error = err;
  api->PJRT_Error_Destroy(&da);
  Fail(std::string(what) + ": " + msg);
}

void AwaitEvent(const PJRT_Api* api, PJRT_Event* ev, const char* what) {
  PJRT_Event_Await_Args aa;
  std::memset(&aa, 0, sizeof aa);
  aa.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aa.event = ev;
  Check(api, api->PJRT_Event_Await(&aa), what);
  PJRT_Event_Destroy_Args ed;
  std::memset(&ed, 0, sizeof ed);
  ed.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  ed.event = ev;
  api->PJRT_Event_Destroy(&ed);
}

// ───────────────────────── tiny JSON reads ────────────────────────
// manifest.json is machine-written by write_native_artifact with known keys;
// these helpers extract scalar values without a JSON dependency.

std::string LoadFile(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Fail("cannot open " + path);
  std::ostringstream ss;
  ss << f.rdbuf();
  return ss.str();
}

std::string JsonRaw(const std::string& js, const std::string& key) {
  std::string pat = "\"" + key + "\":";
  size_t p = js.find(pat);
  if (p == std::string::npos) return "";
  p += pat.size();
  while (p < js.size() && (js[p] == ' ' || js[p] == '\n')) ++p;
  size_t e = p;
  int depth = 0;
  bool in_str = false;
  for (; e < js.size(); ++e) {
    char c = js[e];
    if (in_str) {
      if (c == '"' && js[e - 1] != '\\') in_str = false;
      continue;
    }
    if (c == '"') in_str = true;
    else if (c == '[' || c == '{') ++depth;
    else if (c == ']' || c == '}') {
      if (depth == 0) break;
      --depth;
    } else if ((c == ',' || c == '\n') && depth == 0) break;
  }
  return js.substr(p, e - p);
}

double JsonNum(const std::string& js, const std::string& key, double dflt) {
  std::string raw = JsonRaw(js, key);
  return raw.empty() ? dflt : std::atof(raw.c_str());
}

bool JsonBool(const std::string& js, const std::string& key, bool dflt) {
  std::string raw = JsonRaw(js, key);
  if (raw.rfind("true", 0) == 0) return true;
  if (raw.rfind("false", 0) == 0) return false;
  return dflt;
}

struct TensorSpec {
  std::vector<int64_t> shape;
  std::string dtype;
  int64_t elems() const {
    int64_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
};

std::vector<TensorSpec> ParseSpecs(const std::string& raw) {
  // raw is "[{\"shape\": [..], \"dtype\": \"f32\"}, ...]" or one object
  std::vector<TensorSpec> out;
  size_t p = 0;
  while ((p = raw.find("\"shape\"", p)) != std::string::npos) {
    TensorSpec t;
    size_t lb = raw.find('[', p), rb = raw.find(']', lb);
    std::string dims = raw.substr(lb + 1, rb - lb - 1);
    std::stringstream ss(dims);
    std::string tok;
    while (std::getline(ss, tok, ',')) {
      if (!tok.empty()) t.shape.push_back(std::atoll(tok.c_str()));
    }
    size_t dp = raw.find("\"dtype\"", rb);
    size_t q1 = raw.find('"', raw.find(':', dp) + 1);
    size_t q2 = raw.find('"', q1 + 1);
    t.dtype = raw.substr(q1 + 1, q2 - q1 - 1);
    out.push_back(std::move(t));
    p = q2;
  }
  return out;
}

PJRT_Buffer_Type DtypeToPjrt(const std::string& d) {
  if (d == "uint8") return PJRT_Buffer_Type_U8;
  if (d == "int32") return PJRT_Buffer_Type_S32;
  if (d == "float32") return PJRT_Buffer_Type_F32;
  Fail("unsupported dtype " + d);
}

size_t DtypeSize(const std::string& d) { return d == "uint8" ? 1 : 4; }

// ───────────────────────── PPM image IO ───────────────────────────

struct Image {
  int h = 0, w = 0;
  std::vector<uint8_t> rgb;  // HWC
};

Image ReadPpm(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) Fail("cannot open image " + path);
  std::string magic;
  f >> magic;
  if (magic != "P6") Fail("only binary PPM (P6) images are supported");
  auto next_int = [&f]() {
    int v;
    while (!(f >> v)) Fail("bad PPM header");
    return v;
  };
  Image im;
  im.w = next_int();
  im.h = next_int();
  int maxval = next_int();
  if (maxval != 255) Fail("PPM maxval must be 255");
  f.get();  // single whitespace after header
  im.rgb.resize(static_cast<size_t>(im.h) * im.w * 3);
  f.read(reinterpret_cast<char*>(im.rgb.data()), im.rgb.size());
  if (!f) Fail("truncated PPM " + path);
  return im;
}

void WritePpm(const std::string& path, const Image& im) {
  std::ofstream f(path, std::ios::binary);
  f << "P6\n" << im.w << " " << im.h << "\n255\n";
  f.write(reinterpret_cast<const char*>(im.rgb.data()), im.rgb.size());
}

void DrawBox(Image& im, float x1, float y1, float x2, float y2, int cls) {
  // deterministic per-class color (reference: inferer generate_colors)
  uint8_t col[3] = {static_cast<uint8_t>(37 * (cls + 1) % 255),
                    static_cast<uint8_t>(17 * (cls + 5) % 255),
                    static_cast<uint8_t>(29 * (cls + 11) % 255)};
  int ix1 = std::max(0, static_cast<int>(x1)), iy1 = std::max(0, static_cast<int>(y1));
  int ix2 = std::min(im.w - 1, static_cast<int>(x2));
  int iy2 = std::min(im.h - 1, static_cast<int>(y2));
  for (int t = 0; t < 2; ++t) {
    for (int x = ix1; x <= ix2; ++x) {
      for (int y : {iy1 + t, iy2 - t}) {
        if (y < 0 || y >= im.h) continue;
        uint8_t* px = &im.rgb[(static_cast<size_t>(y) * im.w + x) * 3];
        std::memcpy(px, col, 3);
      }
    }
    for (int y = iy1; y <= iy2; ++y) {
      for (int x : {ix1 + t, ix2 - t}) {
        if (x < 0 || x >= im.w) continue;
        uint8_t* px = &im.rgb[(static_cast<size_t>(y) * im.w + x) * 3];
        std::memcpy(px, col, 3);
      }
    }
  }
}

// ───────────────────────── PJRT session ───────────────────────────

struct PjrtSession {
  const PJRT_Api* api = nullptr;
  PJRT_Client* client = nullptr;
  PJRT_Device* device = nullptr;

  static PJRT_NamedValue Str(const char* name, const char* val) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof v);
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kString;
    v.string_value = val;
    v.value_size = std::strlen(val);
    return v;
  }
  static PJRT_NamedValue I64(const char* name, int64_t val) {
    PJRT_NamedValue v;
    std::memset(&v, 0, sizeof v);
    v.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    v.name = name;
    v.name_size = std::strlen(name);
    v.type = PJRT_NamedValue_kInt64;
    v.int64_value = val;
    v.value_size = 1;
    return v;
  }

  void Open(const std::string& plugin, const std::string& session_id) {
    void* h = dlopen(plugin.c_str(), RTLD_NOW | RTLD_LOCAL);
    if (!h) Fail(std::string("dlopen: ") + dlerror());
    auto get_api = reinterpret_cast<const PJRT_Api* (*)()>(dlsym(h, "GetPjrtApi"));
    if (!get_api) Fail("plugin has no GetPjrtApi symbol");
    api = get_api();

    PJRT_Plugin_Initialize_Args ia;
    std::memset(&ia, 0, sizeof ia);
    ia.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    Check(api, api->PJRT_Plugin_Initialize(&ia), "plugin init");

    std::vector<PJRT_NamedValue> opts;
    const bool is_axon = plugin.find("axon") != std::string::npos;
    std::string topo;
    if (is_axon) {
      // Same option set the Python side passes (axon register/pjrt.py):
      // pool-mode client through the local tunnel, compile on the terminal.
      setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1", 0);
      setenv("AXON_LOOPBACK_RELAY", "1", 0);
      setenv("TPU_WORKER_HOSTNAMES", "localhost", 0);
      setenv("TPU_SKIP_MDS_QUERY", "1", 0);
      setenv("AXON_COMPAT_VERSION", "49", 0);
      const char* gen = getenv("PALLAS_AXON_TPU_GEN");
      topo = std::string(gen ? gen : "v5e") + ":1x1x1";
      opts.push_back(I64("remote_compile", 1));
      opts.push_back(I64("local_only", 0));
      opts.push_back(I64("priority", 0));
      opts.push_back(Str("topology", topo.c_str()));
      opts.push_back(I64("n_slices", 1));
      opts.push_back(Str("session_id", session_id.c_str()));
      opts.push_back(I64("rank", 0xFFFFFFFFll));
    }

    PJRT_Client_Create_Args ca;
    std::memset(&ca, 0, sizeof ca);
    ca.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
    ca.create_options = opts.data();
    ca.num_options = opts.size();
    Check(api, api->PJRT_Client_Create(&ca), "client create");
    client = ca.client;

    PJRT_Client_AddressableDevices_Args da;
    std::memset(&da, 0, sizeof da);
    da.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
    da.client = client;
    Check(api, api->PJRT_Client_AddressableDevices(&da), "devices");
    if (da.num_addressable_devices == 0) Fail("no addressable devices");
    device = da.addressable_devices[0];
  }

  PJRT_LoadedExecutable* Compile(const std::string& module_bc,
                                 const std::string& compile_opts) {
    PJRT_Program prog;
    std::memset(&prog, 0, sizeof prog);
    prog.struct_size = PJRT_Program_STRUCT_SIZE;
    prog.code = const_cast<char*>(module_bc.data());
    prog.code_size = module_bc.size();
    prog.format = "mlir";
    prog.format_size = 4;

    PJRT_Client_Compile_Args ca;
    std::memset(&ca, 0, sizeof ca);
    ca.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
    ca.client = client;
    ca.program = &prog;
    ca.compile_options = compile_opts.data();
    ca.compile_options_size = compile_opts.size();
    Check(api, api->PJRT_Client_Compile(&ca), "compile");
    return ca.executable;
  }

  PJRT_Buffer* ToDevice(const void* data, const TensorSpec& spec) {
    PJRT_Client_BufferFromHostBuffer_Args ba;
    std::memset(&ba, 0, sizeof ba);
    ba.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
    ba.client = client;
    ba.data = data;
    ba.type = DtypeToPjrt(spec.dtype);
    ba.dims = spec.shape.data();
    ba.num_dims = spec.shape.size();
    ba.host_buffer_semantics = PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
    ba.device = device;
    Check(api, api->PJRT_Client_BufferFromHostBuffer(&ba), "host->device");
    AwaitEvent(api, ba.done_with_host_buffer, "transfer done");
    return ba.buffer;
  }

  // Executes and copies every output into `hosts` (caller-sized).
  void Execute(PJRT_LoadedExecutable* exe, PJRT_Buffer* input,
               const std::vector<TensorSpec>& out_specs,
               std::vector<std::vector<uint8_t>>& hosts) {
    PJRT_ExecuteOptions eo;
    std::memset(&eo, 0, sizeof eo);
    eo.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;

    PJRT_Buffer* args[1] = {input};
    PJRT_Buffer* const* arg_list[1] = {args};
    std::vector<PJRT_Buffer*> outs(out_specs.size(), nullptr);
    PJRT_Buffer** out_list[1] = {outs.data()};
    PJRT_Event* done[1] = {nullptr};

    PJRT_LoadedExecutable_Execute_Args ea;
    std::memset(&ea, 0, sizeof ea);
    ea.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ea.executable = exe;
    ea.options = &eo;
    ea.argument_lists = arg_list;
    ea.num_devices = 1;
    ea.num_args = 1;
    ea.output_lists = out_list;
    ea.device_complete_events = done;
    Check(api, api->PJRT_LoadedExecutable_Execute(&ea), "execute");
    AwaitEvent(api, done[0], "execution done");

    hosts.resize(out_specs.size());
    for (size_t i = 0; i < out_specs.size(); ++i) {
      hosts[i].resize(out_specs[i].elems() * DtypeSize(out_specs[i].dtype));
      PJRT_Buffer_ToHostBuffer_Args ta;
      std::memset(&ta, 0, sizeof ta);
      ta.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      ta.src = outs[i];
      ta.dst = hosts[i].data();
      ta.dst_size = hosts[i].size();
      Check(api, api->PJRT_Buffer_ToHostBuffer(&ta), "device->host");
      AwaitEvent(api, ta.event, "copy done");
      DestroyBuffer(outs[i]);
    }
  }

  void DestroyBuffer(PJRT_Buffer* b) {
    PJRT_Buffer_Destroy_Args bd;
    std::memset(&bd, 0, sizeof bd);
    bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
    bd.buffer = b;
    api->PJRT_Buffer_Destroy(&bd);
  }
};

struct Det {
  float x1, y1, x2, y2, score;
  int cls;
};

// Detections for image `b` of the batch from fetched outputs — the in-graph
// NMS path (end2end) or native candidate filter + greedy NMS (reference
// yolov6.cpp:generate_yolo_proposals + nms_sorted_bboxes).
std::vector<Det> ExtractDets(const std::vector<std::vector<uint8_t>>& hosts,
                             const std::vector<TensorSpec>& out_specs,
                             bool end2end, int b, int num_classes,
                             float conf_thres, float iou_thres, int max_det) {
  std::vector<Det> dets;
  if (end2end) {
    // outputs: num_dets [b,1] i32, boxes [b,max_det,4] f32,
    //          scores [b,max_det] f32, classes [b,max_det] i32
    const int md = static_cast<int>(out_specs[1].shape[1]);
    const int n = reinterpret_cast<const int32_t*>(hosts[0].data())[b];
    const float* boxes =
        reinterpret_cast<const float*>(hosts[1].data()) + static_cast<size_t>(b) * md * 4;
    const float* scores =
        reinterpret_cast<const float*>(hosts[2].data()) + static_cast<size_t>(b) * md;
    const int32_t* classes =
        reinterpret_cast<const int32_t*>(hosts[3].data()) + static_cast<size_t>(b) * md;
    for (int i = 0; i < n && i < md; ++i) {
      dets.push_back({boxes[i * 4 + 0], boxes[i * 4 + 1], boxes[i * 4 + 2],
                      boxes[i * 4 + 3], scores[i], classes[i]});
    }
  } else {
    // raw decode output [b, A, 5+nc]
    const TensorSpec& os = out_specs[0];
    const int A = static_cast<int>(os.shape[1]);
    const int C = static_cast<int>(os.shape[2]);
    const float* pred = reinterpret_cast<const float*>(hosts[0].data()) +
                        static_cast<size_t>(b) * A * C;
    std::vector<float> rows;
    for (int a = 0; a < A; ++a) {
      const float* p = pred + static_cast<size_t>(a) * C;
      float obj = p[4];
      int best = 0;
      float best_s = 0;
      for (int c = 0; c < num_classes && 5 + c < C; ++c) {
        if (p[5 + c] > best_s) { best_s = p[5 + c]; best = c; }
      }
      float score = obj * best_s;
      if (score < conf_thres) continue;
      float cx = p[0], cy = p[1], w = p[2], h = p[3];
      rows.insert(rows.end(), {cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2,
                               score, static_cast<float>(best)});
    }
    int n = static_cast<int>(rows.size() / 6);
    std::vector<int> keep(std::max(n, 1));
    int kept = yolov6_nms(rows.data(), n, iou_thres, /*agnostic=*/0, max_det,
                          keep.data());
    for (int i = 0; i < kept; ++i) {
      const float* d = rows.data() + keep[i] * 6;
      dets.push_back({d[0], d[1], d[2], d[3], d[4], static_cast<int>(d[5])});
    }
  }
  return dets;
}

// Letterboxed net coords -> source image coords (reference: inferer rescale).
void RescaleDets(std::vector<Det>& dets, float ratio, int pad_x, int pad_y,
                 int src_h, int src_w) {
  for (auto& d : dets) {
    d.x1 = std::max(0.f, std::min((d.x1 - pad_x) / ratio, static_cast<float>(src_w - 1)));
    d.y1 = std::max(0.f, std::min((d.y1 - pad_y) / ratio, static_cast<float>(src_h - 1)));
    d.x2 = std::max(0.f, std::min((d.x2 - pad_x) / ratio, static_cast<float>(src_w - 1)));
    d.y2 = std::max(0.f, std::min((d.y2 - pad_y) / ratio, static_cast<float>(src_h - 1)));
  }
}

}  // namespace

int main(int argc, char** argv) {
  std::string artifact, image_path, out_path, image_dir;
  std::string plugin = "/opt/axon/libaxon_pjrt.so";
  int loops = 1;
  int threads = 8;
  float conf_override = -1.f;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) Fail("missing value for " + a);
      return argv[++i];
    };
    if (a == "--artifact") artifact = next();
    else if (a == "--image") image_path = next();
    else if (a == "--image-dir") image_dir = next();
    else if (a == "--out") out_path = next();
    else if (a == "--plugin") plugin = next();
    else if (a == "--loops") loops = std::atoi(next().c_str());
    else if (a == "--threads") threads = std::atoi(next().c_str());
    else if (a == "--conf") conf_override = std::atof(next().c_str());
    else Fail("unknown flag " + a);
  }
  if (artifact.empty()) Fail("--artifact DIR is required");

  const std::string manifest = LoadFile(artifact + "/manifest.json");
  TensorSpec in_spec = ParseSpecs(JsonRaw(manifest, "input"))[0];
  std::vector<TensorSpec> out_specs = ParseSpecs(JsonRaw(manifest, "outputs"));
  const bool end2end = JsonBool(manifest, "end2end", false);
  const bool with_preprocess = JsonBool(manifest, "with_preprocess", false);
  const int num_classes = static_cast<int>(JsonNum(manifest, "num_classes", 80));
  float conf_thres = static_cast<float>(JsonNum(manifest, "conf_thres", 0.25));
  const float iou_thres = static_cast<float>(JsonNum(manifest, "iou_thres", 0.45));
  const int max_det = static_cast<int>(JsonNum(manifest, "max_det", 100));
  if (conf_override >= 0) conf_thres = conf_override;

  const int net_h = static_cast<int>(in_spec.shape[1]);
  const int net_w = static_cast<int>(in_spec.shape[2]);
  const int batch = static_cast<int>(in_spec.shape[0]);

  // ── batched serving mode: stream a directory of JPEGs ──
  if (!image_dir.empty()) {
    std::vector<std::string> files;
    DIR* dir = opendir(image_dir.c_str());
    if (!dir) Fail("cannot open dir " + image_dir);
    while (dirent* e = readdir(dir)) {
      std::string n = e->d_name;
      auto ends = [&](const char* s) {
        size_t l = std::strlen(s);
        return n.size() > l && n.compare(n.size() - l, l, s) == 0;
      };
      if (ends(".jpg") || ends(".jpeg") || ends(".JPG") || ends(".JPEG"))
        files.push_back(image_dir + "/" + n);
    }
    closedir(dir);
    std::sort(files.begin(), files.end());
    if (files.empty()) Fail("no JPEG images in " + image_dir);

    PjrtSession s;
    std::string session_id = "yolov6-pjrt-serve-" + std::to_string(::getpid());
    s.Open(plugin, session_id);
    PJRT_LoadedExecutable* exe = s.Compile(LoadFile(artifact + "/module.stablehlo.bc"),
                                           LoadFile(artifact + "/compile_options.pb"));

    const size_t px = static_cast<size_t>(net_h) * net_w;
    const bool u8_in = in_spec.dtype == "uint8";
    const int n_img = static_cast<int>(files.size());
    const int n_batches = (n_img + batch - 1) / batch;

    struct Staged {
      std::vector<uint8_t> raw;  // letterboxed RGB [batch, H, W, 3]
      std::vector<uint8_t> u8;
      std::vector<float> f32;
      std::vector<float> ratios;
      std::vector<int> pads, src_hw;
      int start = 0, count = 0;
    } bufs[2];
    for (auto& st : bufs) {
      st.raw.resize(static_cast<size_t>(batch) * px * 3);
      st.ratios.resize(batch);
      st.pads.resize(2 * batch);
      st.src_hw.resize(2 * batch);
      if (u8_in) st.u8.resize(in_spec.elems());
      else st.f32.resize(in_spec.elems());
    }

    auto stage = [&](int bi, Staged& st) {
      st.start = bi * batch;
      st.count = std::min(batch, n_img - st.start);
      std::vector<const char*> cp(batch);
      for (int i = 0; i < batch; ++i)  // tail batch repeats the last image
        cp[i] = files[std::min(st.start + i, n_img - 1)].c_str();
      yolov6_batch_decode_letterbox(cp.data(), batch, st.raw.data(), net_h, net_w,
                                    /*scaleup=*/0, 114, st.ratios.data(),
                                    st.pads.data(), st.src_hw.data(), threads);
      if (u8_in && with_preprocess) {  // graph wants u8 BGR
        for (size_t p = 0; p < static_cast<size_t>(batch) * px; ++p) {
          st.u8[p * 3 + 0] = st.raw[p * 3 + 2];
          st.u8[p * 3 + 1] = st.raw[p * 3 + 1];
          st.u8[p * 3 + 2] = st.raw[p * 3 + 0];
        }
      } else if (u8_in) {
        std::memcpy(st.u8.data(), st.raw.data(), st.raw.size());
      } else {  // f32 RGB /255
        for (size_t p = 0; p < st.raw.size(); ++p) st.f32[p] = st.raw[p] / 255.0f;
      }
    };

    auto ms = [](auto a, auto b) {
      return std::chrono::duration<double, std::milli>(b - a).count();
    };

    // warmup (compile-side caches, tunnel setup) outside the timed loop
    stage(0, bufs[0]);
    {
      const void* data = u8_in ? static_cast<const void*>(bufs[0].u8.data())
                               : static_cast<const void*>(bufs[0].f32.data());
      PJRT_Buffer* input = s.ToDevice(data, in_spec);
      std::vector<std::vector<uint8_t>> tmp;
      s.Execute(exe, input, out_specs, tmp);
      s.DestroyBuffer(input);
    }

    double dev_ms = 0;
    size_t total_dets = 0;
    auto t_start = std::chrono::steady_clock::now();
    for (int bi = 0; bi < n_batches; ++bi) {
      Staged& cur = bufs[bi & 1];
      std::thread pre;  // decode/stage next batch while this one executes
      if (bi + 1 < n_batches)
        pre = std::thread([&, bi] { stage(bi + 1, bufs[(bi + 1) & 1]); });
      const void* data = u8_in ? static_cast<const void*>(cur.u8.data())
                               : static_cast<const void*>(cur.f32.data());
      PJRT_Buffer* input = s.ToDevice(data, in_spec);
      auto te = std::chrono::steady_clock::now();
      std::vector<std::vector<uint8_t>> hosts;
      s.Execute(exe, input, out_specs, hosts);
      dev_ms += ms(te, std::chrono::steady_clock::now());
      s.DestroyBuffer(input);
      for (int b = 0; b < cur.count; ++b) {
        if (cur.src_hw[2 * b] == 0) {
          std::printf("%s: decode FAILED\n", files[cur.start + b].c_str());
          continue;
        }
        auto dets = ExtractDets(hosts, out_specs, end2end, b, num_classes,
                                conf_thres, iou_thres, max_det);
        RescaleDets(dets, cur.ratios[b], cur.pads[2 * b], cur.pads[2 * b + 1],
                    cur.src_hw[2 * b], cur.src_hw[2 * b + 1]);
        total_dets += dets.size();
        std::printf("%s: %zu detections\n", files[cur.start + b].c_str(), dets.size());
        for (const auto& d : dets)
          std::printf("  cls %d score %.3f box [%.1f %.1f %.1f %.1f]\n", d.cls,
                      d.score, d.x1, d.y1, d.x2, d.y2);
      }
      if (pre.joinable()) pre.join();
    }
    double total = ms(t_start, std::chrono::steady_clock::now());
    std::printf(
        "%d images, %zu detections in %.0f ms — %.1f imgs/s end-to-end "
        "(device %.2f ms/batch of %d)\n",
        n_img, total_dets, total, n_img * 1000.0 / total, dev_ms / n_batches, batch);
    return 0;
  }

  // ── image prep (native letterbox; reference yolov6.cpp:static_resize) ──
  Image src;
  if (!image_path.empty() &&
      (image_path.size() > 4 &&
       (image_path.compare(image_path.size() - 4, 4, ".jpg") == 0 ||
        image_path.compare(image_path.size() - 5, 5, ".jpeg") == 0))) {
    const long cap = 64L * 1024 * 1024 * 3;
    std::vector<uint8_t> buf(cap);
    int h = 0, w = 0;
    if (yolov6_decode_jpeg_file(image_path.c_str(), buf.data(), cap, &h, &w, 0))
      Fail("JPEG decode failed: " + image_path);
    src.h = h;
    src.w = w;
    src.rgb.assign(buf.begin(), buf.begin() + static_cast<size_t>(h) * w * 3);
  } else if (!image_path.empty()) {
    src = ReadPpm(image_path);
  } else {
    src.h = 480;
    src.w = 640;
    src.rgb.resize(static_cast<size_t>(src.h) * src.w * 3);
    unsigned seed = 7;
    for (auto& v : src.rgb)
      v = static_cast<uint8_t>((seed = seed * 1664525u + 1013904223u) >> 24);
  }
  std::vector<uint8_t> boarded(static_cast<size_t>(net_h) * net_w * 3);
  int pad_x = 0, pad_y = 0;
  float ratio = yolov6_letterbox(src.rgb.data(), src.h, src.w, boarded.data(),
                                 net_h, net_w, /*scaleup=*/0, 114, &pad_x, &pad_y);

  // graph input: with_preprocess graphs take u8 BGR (they flip + /255
  // in-graph, reference end2end.py:273-275); otherwise f32 RGB /255
  std::vector<uint8_t> input_u8;
  std::vector<float> input_f32;
  const void* input_data;
  if (in_spec.dtype == "uint8") {
    input_u8.resize(in_spec.elems());
    const size_t px = static_cast<size_t>(net_h) * net_w;
    for (size_t p = 0; p < px; ++p) {
      if (with_preprocess) {  // RGB (PPM) -> BGR
        input_u8[p * 3 + 0] = boarded[p * 3 + 2];
        input_u8[p * 3 + 1] = boarded[p * 3 + 1];
        input_u8[p * 3 + 2] = boarded[p * 3 + 0];
      } else {
        std::memcpy(&input_u8[p * 3], &boarded[p * 3], 3);
      }
    }
    for (int b = 1; b < batch; ++b)
      std::memcpy(&input_u8[static_cast<size_t>(b) * px * 3], input_u8.data(), px * 3);
    input_data = input_u8.data();
  } else {
    input_f32.resize(in_spec.elems());
    const size_t px = static_cast<size_t>(net_h) * net_w;
    for (size_t p = 0; p < px * 3; ++p) input_f32[p] = boarded[p] / 255.0f;
    for (int b = 1; b < batch; ++b)
      std::memcpy(&input_f32[static_cast<size_t>(b) * px * 3], input_f32.data(),
                  px * 3 * sizeof(float));
    input_data = input_f32.data();
  }

  // ── PJRT: client, compile, execute ──
  PjrtSession s;
  std::string session_id = "yolov6-pjrt-runner-" + std::to_string(::getpid());
  auto t0 = std::chrono::steady_clock::now();
  s.Open(plugin, session_id);
  auto t1 = std::chrono::steady_clock::now();
  PJRT_LoadedExecutable* exe = s.Compile(LoadFile(artifact + "/module.stablehlo.bc"),
                                         LoadFile(artifact + "/compile_options.pb"));
  auto t2 = std::chrono::steady_clock::now();

  PJRT_Buffer* input = s.ToDevice(input_data, in_spec);
  std::vector<std::vector<uint8_t>> hosts;
  s.Execute(exe, input, out_specs, hosts);  // warmup + results
  auto t3 = std::chrono::steady_clock::now();
  double exec_ms = 0;
  if (loops > 1) {
    auto tl = std::chrono::steady_clock::now();
    for (int i = 0; i < loops; ++i) {
      std::vector<std::vector<uint8_t>> tmp;
      s.Execute(exe, input, out_specs, tmp);
    }
    exec_ms = std::chrono::duration<double, std::milli>(
                  std::chrono::steady_clock::now() - tl).count() / loops;
  }

  auto ms = [](auto a, auto b) {
    return std::chrono::duration<double, std::milli>(b - a).count();
  };
  std::printf("client: %.0f ms  compile: %.0f ms  first-exec: %.0f ms",
              ms(t0, t1), ms(t1, t2), ms(t2, t3));
  if (loops > 1) std::printf("  steady-exec: %.2f ms (round-trip, %d loops)", exec_ms, loops);
  std::printf("\n");

  // ── decode + suppression (first image of the batch), then rescale from
  // letterboxed net coords back to the source image ──
  std::vector<Det> dets = ExtractDets(hosts, out_specs, end2end, /*b=*/0,
                                      num_classes, conf_thres, iou_thres, max_det);
  RescaleDets(dets, ratio, pad_x, pad_y, src.h, src.w);

  std::printf("%zu detections\n", dets.size());
  for (size_t i = 0; i < dets.size(); ++i) {
    const auto& d = dets[i];
    std::printf("  [%zu] cls %d score %.3f box [%.1f %.1f %.1f %.1f]\n", i, d.cls,
                d.score, d.x1, d.y1, d.x2, d.y2);
  }

  if (!out_path.empty()) {
    for (const auto& d : dets) DrawBox(src, d.x1, d.y1, d.x2, d.y2, d.cls);
    WritePpm(out_path, src);
    std::printf("wrote %s\n", out_path.c_str());
  }
  return 0;
}
