// ppi-sweep: native experiment sweep executor.
//
// The runtime component around the TPU compute path: launches a sweep of
// experiment commands (one per line of a spec file) across a bounded pool of
// worker processes, streams per-job status, and writes a JSONL summary with
// exit codes and wall-clock durations. Replaces the reference's Makefile
// sweep UX (reference: Makefile:8-21) with a production-grade tool:
// bounded parallelism, per-job logs, retries, and clean SIGINT teardown of
// the whole process group.
//
// Build:   make -C native          (produces native/ppi-sweep)
// Usage:   ppi-sweep <spec-file> [-j N] [-r retries] [-o summary.jsonl]
//                     [-l logdir]
//   spec-file: one shell command per line; blank lines and '#' comments
//   are skipped.

#include <csignal>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <fstream>
#include <iostream>
#include <queue>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>
#include <vector>

namespace {

struct Job {
  int id = 0;
  std::string cmd;
  int attempts = 0;
  double started = 0.0;
  pid_t pid = -1;
};

volatile std::sig_atomic_t g_interrupted = 0;

void handle_sigint(int) { g_interrupted = 1; }

double now_seconds() {
  struct timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return static_cast<double>(ts.tv_sec) + 1e-9 * ts.tv_nsec;
}

std::string json_escape(const std::string& s) {
  std::string out;
  for (char c : s) {
    switch (c) {
      case '"': out += "\\\""; break;
      case '\\': out += "\\\\"; break;
      case '\n': out += "\\n"; break;
      case '\t': out += "\\t"; break;
      default: out += c;
    }
  }
  return out;
}

pid_t spawn(const Job& job, const std::string& logdir) {
  pid_t pid = fork();
  if (pid != 0) return pid;
  // child: own process group so a sweep-level SIGINT can kill the tree
  setpgid(0, 0);
  if (!logdir.empty()) {
    std::ostringstream path;
    path << logdir << "/job_" << job.id << "_attempt" << job.attempts
         << ".log";
    FILE* f = freopen(path.str().c_str(), "w", stdout);
    if (f != nullptr) dup2(fileno(stdout), fileno(stderr));
  }
  execl("/bin/sh", "sh", "-c", job.cmd.c_str(), (char*)nullptr);
  _exit(127);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr,
                 "usage: %s <spec-file> [-j N] [-r retries] "
                 "[-o summary.jsonl] [-l logdir]\n",
                 argv[0]);
    return 2;
  }
  std::string spec_path = argv[1];
  long n_workers = sysconf(_SC_NPROCESSORS_ONLN);
  int max_retries = 0;
  std::string summary_path = "sweep_summary.jsonl";
  std::string logdir;
  for (int i = 2; i + 1 < argc; i += 2) {
    std::string flag = argv[i];
    if (flag == "-j") n_workers = std::atol(argv[i + 1]);
    else if (flag == "-r") max_retries = std::atoi(argv[i + 1]);
    else if (flag == "-o") summary_path = argv[i + 1];
    else if (flag == "-l") logdir = argv[i + 1];
  }
  if (n_workers < 1) n_workers = 1;
  if (!logdir.empty()) mkdir(logdir.c_str(), 0755);

  std::ifstream spec(spec_path);
  if (!spec) {
    std::fprintf(stderr, "cannot open spec file %s\n", spec_path.c_str());
    return 2;
  }
  std::queue<Job> pending;
  std::string line;
  int next_id = 0;
  while (std::getline(spec, line)) {
    // trim
    size_t a = line.find_first_not_of(" \t");
    if (a == std::string::npos) continue;
    if (line[a] == '#') continue;
    Job j;
    j.id = next_id++;
    j.cmd = line.substr(a);
    pending.push(j);
  }
  int total = next_id;
  std::fprintf(stderr, "ppi-sweep: %d jobs, %ld workers, %d retries\n", total,
               n_workers, max_retries);

  std::signal(SIGINT, handle_sigint);
  std::ofstream summary(summary_path);
  std::vector<Job> running;
  int done = 0, failed = 0;

  while ((!pending.empty() || !running.empty()) && !g_interrupted) {
    // fill the pool
    while (!pending.empty() &&
           running.size() < static_cast<size_t>(n_workers)) {
      Job j = pending.front();
      pending.pop();
      j.attempts += 1;
      j.started = now_seconds();
      j.pid = spawn(j, logdir);
      std::fprintf(stderr, "[start %d/%d] #%d: %s\n", done + 1, total, j.id,
                   j.cmd.c_str());
      running.push_back(j);
    }
    int status = 0;
    pid_t pid = waitpid(-1, &status, 0);
    if (pid <= 0) continue;
    for (size_t k = 0; k < running.size(); ++k) {
      if (running[k].pid != pid) continue;
      Job j = running[k];
      running.erase(running.begin() + k);
      double dur = now_seconds() - j.started;
      int code = WIFEXITED(status) ? WEXITSTATUS(status) : -WTERMSIG(status);
      bool ok = code == 0;
      if (!ok && j.attempts <= max_retries) {
        std::fprintf(stderr, "[retry] #%d (exit %d)\n", j.id, code);
        pending.push(j);
        break;
      }
      done += 1;
      failed += ok ? 0 : 1;
      summary << "{\"id\": " << j.id << ", \"cmd\": \""
              << json_escape(j.cmd) << "\", \"exit\": " << code
              << ", \"seconds\": " << dur
              << ", \"attempts\": " << j.attempts << "}\n";
      summary.flush();
      std::fprintf(stderr, "[%s %d/%d] #%d (%.1fs)\n", ok ? "done" : "FAIL",
                   done, total, j.id, dur);
      break;
    }
  }

  if (g_interrupted) {
    std::fprintf(stderr, "interrupted; killing %zu running jobs\n",
                 running.size());
    for (auto& j : running) kill(-j.pid, SIGTERM);
    while (waitpid(-1, nullptr, 0) > 0) {
    }
    return 130;
  }
  std::fprintf(stderr, "sweep complete: %d ok, %d failed -> %s\n",
               done - failed, failed, summary_path.c_str());
  return failed == 0 ? 0 : 1;
}
