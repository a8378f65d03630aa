#pragma once
// Identity stub of the tiny OIDN API surface used by the reference's
// utils.cpp (OIDN_denoise) — lets the reference build without the vendored
// OpenImageDenoise binaries (absent from the mount, .MISSING_LARGE_BLOBS).
// "Denoised" output == input; the parity harness only compares the raw
// RT_output buffer.
#include <cstddef>
#include <memory>
#include <vector>

namespace oidn {

enum class Error { None };
enum class Format { Float3 };

class BufferRef {
 public:
  explicit BufferRef(std::size_t bytes = 0)
      : data_(std::make_shared<std::vector<char>>(bytes)) {}
  void* getData() { return data_->data(); }

 private:
  std::shared_ptr<std::vector<char>> data_;
};

class FilterRef {
 public:
  void setImage(const char*, BufferRef&, Format, int, int) {}
  void set(const char*, bool) {}
  void commit() {}
  void execute() {}
};

class DeviceRef {
 public:
  void commit() {}
  BufferRef newBuffer(std::size_t bytes) { return BufferRef(bytes); }
  FilterRef newFilter(const char*) { return FilterRef(); }
  Error getError(const char*& msg) {
    msg = "";
    return Error::None;
  }
};

inline DeviceRef newDevice() { return DeviceRef(); }

}  // namespace oidn
