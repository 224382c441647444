// KITTI offline 3D object detection evaluator — standalone C++17 rebuild.
//
// Same CLI and metric semantics as the reference evaluator studied at
// /root/reference/src/tools/kitti_eval/evaluate_object_3d_offline.cpp
// (41-point interpolated AP for 2D-image / ground-plane BEV / 3D-box
// overlap plus AOS; Easy/Moderate/Hard gating by min-height 40/25/25 px,
// max-occlusion 0/1/2, max-truncation .15/.3/.5; IoU 0.7 for Car and 0.5
// for Pedestrian/Cyclist; greedy per-image TP assignment with neighbouring
// class and DontCare handling; running-max precision interpolation).
//
// Implementation is from scratch: convex polygon intersection uses a
// Sutherland–Hodgman clip + shoelace area instead of boost::geometry, and
// no gnuplot/eps toolchain is required (plot data files are still written).
//
// Usage: ./evaluate_object_3d_offline <gt_dir> <result_dir>

#include <algorithm>
#include <array>
#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <numeric>
#include <set>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

constexpr int kNumSamplePts = 41;
constexpr int kNumClasses = 3;
const char *kClassNames[kNumClasses] = {"car", "pedestrian", "cyclist"};
constexpr int kMinHeight[3] = {40, 25, 25};
constexpr int kMaxOcclusion[3] = {0, 1, 2};
constexpr double kMaxTruncation[3] = {0.15, 0.3, 0.5};
// min overlap [metric][class]: rows = image / ground / 3d
constexpr double kMinOverlap[3][3] = {
    {0.7, 0.5, 0.5}, {0.5, 0.25, 0.25}, {0.5, 0.25, 0.25}};

enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

struct Label {
  std::string type;
  double truncation = -1;
  int occlusion = -1;
  double alpha = -10;
  double x1 = -1, y1 = -1, x2 = -1, y2 = -1;
  double h = 0, w = 0, l = 0;
  double t1 = -1000, t2 = -1000, t3 = -1000;
  double ry = -10;
  double score = -1000;  // detections only
};

using Frame = std::vector<Label>;

bool iequals(const std::string &a, const char *b) {
  return strcasecmp(a.c_str(), b) == 0;
}

// ----------------------------------------------------------- polygon overlap
struct Pt {
  double x, z;
};

using Poly = std::vector<Pt>;

Poly bevPolygon(const Label &b) {
  const double c = std::cos(b.ry), s = std::sin(b.ry);
  const double dx[4] = {b.l / 2, b.l / 2, -b.l / 2, -b.l / 2};
  const double dz[4] = {b.w / 2, -b.w / 2, -b.w / 2, b.w / 2};
  Poly p(4);
  for (int i = 0; i < 4; ++i) {
    p[i].x = c * dx[i] + s * dz[i] + b.t1;
    p[i].z = -s * dx[i] + c * dz[i] + b.t3;
  }
  return p;
}

double polyArea(const Poly &p) {
  double a = 0;
  const size_t n = p.size();
  for (size_t i = 0; i < n; ++i) {
    const Pt &u = p[i], &v = p[(i + 1) % n];
    a += u.x * v.z - v.x * u.z;
  }
  return std::fabs(a) / 2.0;
}

// clip convex `subject` against the half-plane left of edge (a -> b)
Poly clipEdge(const Poly &subject, const Pt &a, const Pt &b) {
  Poly out;
  const size_t n = subject.size();
  auto side = [&](const Pt &p) {
    return (b.x - a.x) * (p.z - a.z) - (b.z - a.z) * (p.x - a.x);
  };
  for (size_t i = 0; i < n; ++i) {
    const Pt &cur = subject[i];
    const Pt &nxt = subject[(i + 1) % n];
    const double sc = side(cur), sn = side(nxt);
    if (sc >= 0) out.push_back(cur);
    if ((sc >= 0) != (sn >= 0)) {
      const double t = sc / (sc - sn);
      out.push_back({cur.x + t * (nxt.x - cur.x), cur.z + t * (nxt.z - cur.z)});
    }
  }
  return out;
}

double convexIntersectionArea(const Poly &a, Poly b) {
  // ensure CCW orientation of the clip polygon
  Poly clip = a;
  double signed_area = 0;
  for (size_t i = 0; i < clip.size(); ++i) {
    const Pt &u = clip[i], &v = clip[(i + 1) % clip.size()];
    signed_area += u.x * v.z - v.x * u.z;
  }
  if (signed_area < 0) std::reverse(clip.begin(), clip.end());
  for (size_t i = 0; i < clip.size() && !b.empty(); ++i)
    b = clipEdge(b, clip[i], clip[(i + 1) % clip.size()]);
  return b.empty() ? 0.0 : polyArea(b);
}

// criterion: -1 union IoU, 0 over detection, 1 over ground truth
double imageOverlap(const Label &d, const Label &g, int criterion) {
  const double x1 = std::max(d.x1, g.x1), y1 = std::max(d.y1, g.y1);
  const double x2 = std::min(d.x2, g.x2), y2 = std::min(d.y2, g.y2);
  const double w = x2 - x1, h = y2 - y1;
  if (w <= 0 || h <= 0) return 0;
  const double inter = w * h;
  const double da = (d.x2 - d.x1) * (d.y2 - d.y1);
  const double ga = (g.x2 - g.x1) * (g.y2 - g.y1);
  if (criterion == 0) return inter / da;
  if (criterion == 1) return inter / ga;
  return inter / (da + ga - inter);
}

double groundOverlap(const Label &d, const Label &g, int criterion) {
  const Poly dp = bevPolygon(d), gp = bevPolygon(g);
  const double inter = convexIntersectionArea(gp, dp);
  const double da = polyArea(dp), ga = polyArea(gp);
  if (criterion == 0) return da > 0 ? inter / da : 0;
  if (criterion == 1) return ga > 0 ? inter / ga : 0;
  const double uni = da + ga - inter;
  return uni > 0 ? inter / uni : 0;
}

double box3dOverlap(const Label &d, const Label &g, int criterion) {
  const Poly dp = bevPolygon(d), gp = bevPolygon(g);
  const double inter_area = convexIntersectionArea(gp, dp);
  const double ymax = std::min(d.t2, g.t2);
  const double ymin = std::max(d.t2 - d.h, g.t2 - g.h);
  const double inter = inter_area * std::max(0.0, ymax - ymin);
  const double dv = d.h * d.w * d.l, gv = g.h * g.w * g.l;
  if (criterion == 0) return dv > 0 ? inter / dv : 0;
  if (criterion == 1) return gv > 0 ? inter / gv : 0;
  const double uni = dv + gv - inter;
  return uni > 0 ? inter / uni : 0;
}

using OverlapFn = double (*)(const Label &, const Label &, int);

// -------------------------------------------------------------------- IO
bool loadFrame(const std::string &path, bool is_det, Frame *out) {
  FILE *fp = std::fopen(path.c_str(), "r");
  if (!fp) return false;
  char type[256];
  while (true) {
    Label lb;
    int n;
    if (is_det) {
      double trash;
      n = std::fscanf(fp,
                      "%255s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                      "%lf %lf %lf",
                      type, &trash, &trash, &lb.alpha, &lb.x1, &lb.y1, &lb.x2,
                      &lb.y2, &lb.h, &lb.w, &lb.l, &lb.t1, &lb.t2, &lb.t3,
                      &lb.ry, &lb.score);
      if (n != 16) break;
    } else {
      n = std::fscanf(fp,
                      "%255s %lf %d %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                      "%lf %lf",
                      type, &lb.truncation, &lb.occlusion, &lb.alpha, &lb.x1,
                      &lb.y1, &lb.x2, &lb.y2, &lb.h, &lb.w, &lb.l, &lb.t1,
                      &lb.t2, &lb.t3, &lb.ry);
      if (n != 15) break;
    }
    lb.type = type;
    out->push_back(lb);
  }
  std::fclose(fp);
  return true;
}

std::vector<int> resultIndices(const std::string &result_dir) {
  std::set<int> ids;
  if (DIR *dir = opendir(result_dir.c_str())) {
    while (dirent *e = readdir(dir)) {
      const std::string name(e->d_name);
      if (name.size() < 10) continue;
      ids.insert(std::atoi(name.substr(name.size() - 10, 6).c_str()));
    }
    closedir(dir);
  }
  return {ids.begin(), ids.end()};
}

// ----------------------------------------------------------- core statistics
struct PrData {
  std::vector<double> scores;  // TP scores, for recall thresholding
  double similarity = 0;
  int tp = 0, fp = 0, fn = 0;
};

// classify gt/detections for one frame at one difficulty
void gateFrame(int cls, int difficulty, const Frame &gt, const Frame &det,
               std::vector<int> *ig_gt, std::vector<int> *ig_det,
               Frame *dontcare, int *n_gt) {
  for (const Label &g : gt) {
    const double height = g.y2 - g.y1;
    int valid;
    if (iequals(g.type, kClassNames[cls]))
      valid = 1;
    else if (cls == 1 /*pedestrian*/ && iequals(g.type, "Person_sitting"))
      valid = 0;
    else if (cls == 0 /*car*/ && iequals(g.type, "Van"))
      valid = 0;
    else
      valid = -1;

    const bool hard = g.occlusion > kMaxOcclusion[difficulty] ||
                      g.truncation > kMaxTruncation[difficulty] ||
                      height < kMinHeight[difficulty];
    if (valid == 1 && !hard) {
      ig_gt->push_back(0);
      ++*n_gt;
    } else if (valid == 0 || (valid == 1 && hard)) {
      ig_gt->push_back(1);
    } else {
      ig_gt->push_back(-1);
    }
  }
  for (const Label &g : gt)
    if (iequals(g.type, "DontCare")) dontcare->push_back(g);
  for (const Label &d : det) {
    const double height = std::fabs(d.y2 - d.y1);
    if (height < kMinHeight[difficulty])
      ig_det->push_back(1);
    else if (iequals(d.type, kClassNames[cls]))
      ig_det->push_back(0);
    else
      ig_det->push_back(-1);
  }
}

PrData frameStats(int cls, Metric metric, const Frame &gt, const Frame &det,
                  const Frame &dontcare, const std::vector<int> &ig_gt,
                  const std::vector<int> &ig_det, bool compute_fp,
                  OverlapFn overlap_fn, bool compute_aos, double thresh) {
  PrData stat;
  constexpr double kNoDetection = -1e7;
  std::vector<double> deltas;
  std::vector<bool> assigned(det.size(), false);
  std::vector<bool> below_thresh(det.size(), false);
  if (compute_fp)
    for (size_t j = 0; j < det.size(); ++j)
      if (det[j].score < thresh) below_thresh[j] = true;

  const double min_ov = kMinOverlap[metric][cls];

  for (size_t i = 0; i < gt.size(); ++i) {
    if (ig_gt[i] == -1) continue;

    int det_idx = -1;
    double valid_detection = kNoDetection;
    double max_overlap = 0;
    bool assigned_ignored = false;

    for (size_t j = 0; j < det.size(); ++j) {
      if (ig_det[j] == -1 || assigned[j] || below_thresh[j]) continue;
      const double ov = overlap_fn(det[j], gt[i], -1);
      if (!compute_fp && ov > min_ov && det[j].score > valid_detection) {
        // recall pass: highest-scoring candidate wins
        det_idx = static_cast<int>(j);
        valid_detection = det[j].score;
      } else if (compute_fp && ov > min_ov &&
                 (ov > max_overlap || assigned_ignored) && ig_det[j] == 0) {
        // precision pass: greatest-overlap valid candidate wins
        max_overlap = ov;
        det_idx = static_cast<int>(j);
        valid_detection = 1;
        assigned_ignored = false;
      } else if (compute_fp && ov > min_ov &&
                 valid_detection == kNoDetection && ig_det[j] == 1) {
        det_idx = static_cast<int>(j);
        valid_detection = 1;
        assigned_ignored = true;
      }
    }

    if (valid_detection == kNoDetection && ig_gt[i] == 0) {
      ++stat.fn;
    } else if (valid_detection != kNoDetection &&
               (ig_gt[i] == 1 || ig_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != kNoDetection) {
      ++stat.tp;
      stat.scores.push_back(det[det_idx].score);
      if (compute_aos) deltas.push_back(gt[i].alpha - det[det_idx].alpha);
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t j = 0; j < det.size(); ++j)
      if (!(assigned[j] || ig_det[j] == -1 || ig_det[j] == 1 ||
            below_thresh[j]))
        ++stat.fp;

    // detections swallowed by DontCare regions are not false positives
    int nstuff = 0;
    for (const Label &dc : dontcare) {
      for (size_t j = 0; j < det.size(); ++j) {
        if (assigned[j] || ig_det[j] == -1 || ig_det[j] == 1 ||
            below_thresh[j])
          continue;
        if (overlap_fn(det[j], dc, 0) > min_ov) {
          assigned[j] = true;
          ++nstuff;
        }
      }
    }
    stat.fp -= nstuff;

    if (compute_aos) {
      std::vector<double> sims(stat.fp, 0.0);
      for (double d : deltas) sims.push_back((1.0 + std::cos(d)) / 2.0);
      if (stat.tp > 0 || stat.fp > 0)
        stat.similarity = std::accumulate(sims.begin(), sims.end(), 0.0);
      else
        stat.similarity = -1;
    }
  }
  return stat;
}

std::vector<double> recallThresholds(std::vector<double> scores, double n_gt) {
  std::sort(scores.begin(), scores.end(), std::greater<double>());
  std::vector<double> t;
  double current_recall = 0;
  for (size_t i = 0; i < scores.size(); ++i) {
    const double l_recall = (i + 1) / n_gt;
    const double r_recall =
        i < scores.size() - 1 ? (i + 2) / n_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < scores.size() - 1)
      continue;
    t.push_back(scores[i]);
    current_recall += 1.0 / (kNumSamplePts - 1.0);
  }
  return t;
}

struct CurveSet {
  std::vector<double> precision[3];  // per difficulty
  std::vector<double> aos[3];
};

bool evalClass(int cls, Metric metric, OverlapFn overlap_fn, bool compute_aos,
               const std::vector<Frame> &gts, const std::vector<Frame> &dets,
               int difficulty, std::vector<double> *precision,
               std::vector<double> *aos, FILE *fp_det, FILE *fp_ori) {
  int n_gt = 0;
  std::vector<double> all_scores;
  std::vector<std::vector<int>> ig_gts, ig_dets;
  std::vector<Frame> dontcares;

  for (size_t i = 0; i < gts.size(); ++i) {
    std::vector<int> ig_gt, ig_det;
    Frame dc;
    gateFrame(cls, difficulty, gts[i], dets[i], &ig_gt, &ig_det, &dc, &n_gt);
    PrData pr = frameStats(cls, metric, gts[i], dets[i], dc, ig_gt, ig_det,
                           false, overlap_fn, false, 0);
    all_scores.insert(all_scores.end(), pr.scores.begin(), pr.scores.end());
    ig_gts.push_back(std::move(ig_gt));
    ig_dets.push_back(std::move(ig_det));
    dontcares.push_back(std::move(dc));
  }

  const std::vector<double> thresholds = recallThresholds(all_scores, n_gt);
  std::vector<PrData> pr(thresholds.size());
  for (size_t i = 0; i < gts.size(); ++i) {
    for (size_t t = 0; t < thresholds.size(); ++t) {
      PrData tmp = frameStats(cls, metric, gts[i], dets[i], dontcares[i],
                              ig_gts[i], ig_dets[i], true, overlap_fn,
                              compute_aos, thresholds[t]);
      pr[t].tp += tmp.tp;
      pr[t].fp += tmp.fp;
      pr[t].fn += tmp.fn;
      if (tmp.similarity != -1) pr[t].similarity += tmp.similarity;
    }
  }

  precision->assign(kNumSamplePts, 0);
  if (compute_aos) aos->assign(kNumSamplePts, 0);
  for (size_t i = 0; i < thresholds.size(); ++i) {
    (*precision)[i] = pr[i].tp / double(pr[i].tp + pr[i].fp);
    if (compute_aos)
      (*aos)[i] = pr[i].similarity / double(pr[i].tp + pr[i].fp);
  }
  // running-max interpolation
  for (size_t i = 0; i < thresholds.size(); ++i) {
    (*precision)[i] =
        *std::max_element(precision->begin() + i, precision->end());
    if (compute_aos)
      (*aos)[i] = *std::max_element(aos->begin() + i, aos->end());
  }

  if (fp_det && !precision->empty()) {
    for (double p : *precision) std::fprintf(fp_det, "%f ", p);
    std::fprintf(fp_det, "\n");
  }
  if (fp_ori && compute_aos && !aos->empty()) {
    for (double a : *aos) std::fprintf(fp_ori, "%f ", a);
    std::fprintf(fp_ori, "\n");
  }
  return true;
}

void writeCurves(const std::string &plot_dir, const std::string &file_name,
                 std::vector<double> vals[3]) {
  FILE *fp = std::fopen((plot_dir + "/" + file_name + ".txt").c_str(), "w");
  if (fp) {
    std::printf("save %s\n", (plot_dir + "/" + file_name + ".txt").c_str());
    for (int i = 0; i < kNumSamplePts; ++i)
      std::fprintf(fp, "%f %f %f %f\n", i / (kNumSamplePts - 1.0),
                   vals[0][i], vals[1][i], vals[2][i]);
    std::fclose(fp);
  }
  // 11-point AP summary (every 4th of the 41 points)
  double sum[3] = {0, 0, 0};
  for (int v = 0; v < 3; ++v)
    for (size_t i = 0; i < vals[v].size(); i += 4) sum[v] += vals[v][i];
  std::printf("%s AP: %f %f %f\n", file_name.c_str(), sum[0] / 11 * 100,
              sum[1] / 11 * 100, sum[2] / 11 * 100);
}

}  // namespace

int main(int argc, char **argv) {
  if (argc != 3) {
    std::printf("Usage: %s <gt_dir> <result_dir>\n", argv[0]);
    return 1;
  }
  std::string gt_dir = argv[1];
  std::string result_dir = argv[2];
  if (!result_dir.empty() && result_dir.back() == '/') result_dir.pop_back();
  const std::string plot_dir = result_dir + "/../plot";
  mkdir(plot_dir.c_str(), 0755);

  const std::vector<int> indices = resultIndices(result_dir);
  std::printf("number of files for evaluation: %d\n", (int)indices.size());

  std::vector<Frame> gts, dets;
  bool compute_aos = true;
  bool has_image[kNumClasses] = {}, has_ground[kNumClasses] = {},
       has_3d[kNumClasses] = {};
  for (int idx : indices) {
    char name[32];
    std::snprintf(name, sizeof(name), "%06d.txt", idx);
    Frame gt, det;
    if (!loadFrame(gt_dir + "/" + name, false, &gt)) {
      std::printf("ERROR: couldn't read ground truth %s\n", name);
      return 1;
    }
    if (!loadFrame(result_dir + "/" + name, true, &det)) {
      std::printf("ERROR: couldn't read result %s\n", name);
      return 1;
    }
    for (const Label &d : det) {
      if (d.alpha == -10) compute_aos = false;
      for (int c = 0; c < kNumClasses; ++c) {
        if (iequals(d.type, kClassNames[c])) {
          if (d.x1 >= 0) has_image[c] = true;
          if (d.t1 != -1000) has_ground[c] = true;
          if (d.t2 != -1000) has_3d[c] = true;
        }
      }
    }
    gts.push_back(std::move(gt));
    dets.push_back(std::move(det));
  }

  struct Task {
    Metric metric;
    OverlapFn fn;
    const bool *enabled;
    const char *suffix;
    bool aos;
  };
  const Task tasks[3] = {
      {IMAGE, imageOverlap, has_image, "detection", compute_aos},
      {GROUND, groundOverlap, has_ground, "detection_ground", false},
      {BOX3D, box3dOverlap, has_3d, "detection_3d", false},
  };

  for (const Task &task : tasks) {
    for (int c = 0; c < kNumClasses; ++c) {
      if (!task.enabled[c]) continue;
      const std::string base = std::string(kClassNames[c]) + "_" + task.suffix;
      FILE *fp_det = std::fopen(
          (result_dir + "/../stats_" + base + ".txt").c_str(), "w");
      FILE *fp_ori = nullptr;
      if (task.aos)
        fp_ori = std::fopen((result_dir + "/../stats_" +
                             std::string(kClassNames[c]) + "_orientation.txt")
                                .c_str(),
                            "w");
      CurveSet cs;
      for (int d = 0; d < 3; ++d)
        evalClass(c, task.metric, task.fn, task.aos, gts, dets, d,
                  &cs.precision[d], &cs.aos[d], fp_det, fp_ori);
      if (fp_det) std::fclose(fp_det);
      writeCurves(plot_dir, base, cs.precision);
      if (task.aos) {
        writeCurves(plot_dir, std::string(kClassNames[c]) + "_orientation",
                    cs.aos);
        if (fp_ori) std::fclose(fp_ori);
      }
    }
  }
  std::printf("evaluation finished: %s\n", result_dir.c_str());
  return 0;
}
