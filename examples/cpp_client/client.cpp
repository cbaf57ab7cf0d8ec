// Native C++ inference client for the fce-yolo-tpu serving protocol.
//
// Deployment-consumer analog of the reference's C++ examples
// (examples/YOLO11-Triton-CPP/inference.cpp — remote-server client;
// examples/YOLOv8-CPP-Inference — local OpenCV pipeline): reads an image
// with OpenCV, streams it to the TPU inference server (fce_yolo_tpu/serve.py)
// over the binary protocol, and draws the returned detections.
//
// Build:  see examples/cpp_client/CMakeLists.txt
// Run:    ./fy_client <host> <port> <image> [out.jpg]

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

bool send_all(int fd, const void* data, size_t n) {
  const char* p = (const char*)data;
  while (n) {
    ssize_t k = ::send(fd, p, n, 0);
    if (k <= 0) return false;
    p += k;
    n -= (size_t)k;
  }
  return true;
}

bool recv_all(int fd, void* data, size_t n) {
  char* p = (char*)data;
  while (n) {
    ssize_t k = ::recv(fd, p, n, 0);
    if (k <= 0) return false;
    p += k;
    n -= (size_t)k;
  }
  return true;
}

struct Detection {
  float x1, y1, x2, y2, conf, cls;
};

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    std::fprintf(stderr, "usage: %s <host> <port> <image> [out.jpg]\n", argv[0]);
    return 2;
  }
  const char* host = argv[1];
  int port = std::atoi(argv[2]);
  cv::Mat img = cv::imread(argv[3], cv::IMREAD_COLOR);
  if (img.empty()) {
    std::fprintf(stderr, "failed to read %s\n", argv[3]);
    return 1;
  }

  addrinfo hints{}, *res = nullptr;
  hints.ai_family = AF_INET;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(host, std::to_string(port).c_str(), &hints, &res) != 0 || !res) {
    std::fprintf(stderr, "resolve failed\n");
    return 1;
  }
  int fd = ::socket(res->ai_family, res->ai_socktype, res->ai_protocol);
  if (fd < 0 || ::connect(fd, res->ai_addr, res->ai_addrlen) != 0) {
    std::fprintf(stderr, "connect failed\n");
    return 1;
  }
  freeaddrinfo(res);

  // request: u32 h, u32 w, raw BGR bytes
  uint32_t hdr[2] = {(uint32_t)img.rows, (uint32_t)img.cols};
  cv::Mat cont = img.isContinuous() ? img : img.clone();
  if (!send_all(fd, hdr, sizeof(hdr)) ||
      !send_all(fd, cont.data, (size_t)img.rows * img.cols * 3)) {
    std::fprintf(stderr, "send failed\n");
    return 1;
  }

  uint32_t n = 0;
  if (!recv_all(fd, &n, 4)) {
    std::fprintf(stderr, "recv header failed\n");
    return 1;
  }
  std::vector<Detection> dets(n);
  if (n && !recv_all(fd, dets.data(), sizeof(Detection) * n)) {
    std::fprintf(stderr, "recv body failed\n");
    return 1;
  }
  ::close(fd);

  std::printf("%u detections\n", n);
  for (const auto& d : dets) {
    std::printf("cls=%d conf=%.3f box=[%.1f %.1f %.1f %.1f]\n", (int)d.cls, d.conf,
                d.x1, d.y1, d.x2, d.y2);
    cv::rectangle(img, cv::Point((int)d.x1, (int)d.y1), cv::Point((int)d.x2, (int)d.y2),
                  cv::Scalar(0, 255, 0), 2);
    char label[64];
    std::snprintf(label, sizeof(label), "%d %.2f", (int)d.cls, d.conf);
    cv::putText(img, label, cv::Point((int)d.x1, (int)d.y1 - 4),
                cv::FONT_HERSHEY_SIMPLEX, 0.5, cv::Scalar(0, 255, 0), 1);
  }
  if (argc > 4) {
    cv::imwrite(argv[4], img);
    std::printf("wrote %s\n", argv[4]);
  }
  return 0;
}
