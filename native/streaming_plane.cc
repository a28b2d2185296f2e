// Native host streaming plane for webrtc_audio_processing_tpu.
//
// The reference runtime is C++: render/capture hand-off via lock-free
// SwapQueues (rtc_base/swap_queue.h), per-stream AudioProcessing instances,
// RaceChecker debug guards (rtc_base/race_checker.h) and a metrics registry
// (system_wrappers/source/metrics.cc). This library is the TPU-native
// equivalent of that host plane: per-stream SPSC frame queues feeding a
// batching engine that gathers one 10 ms frame per ready stream into a
// contiguous (num_streams, samples, channels) tensor for the vmapped,
// jitted device step, then scatters device output back to per-stream
// output queues.
//
// Threading model (mirrors the reference's two-thread contract):
//  - one producer thread per stream side may push frames (SPSC per queue);
//  - one engine thread collects/distributes batches.
// All queue operations are lock-free (acquire/release atomics).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <new>
#include <vector>

namespace {

constexpr int kMaxFrameSamples = 480;  // 10 ms at 48 kHz
constexpr int kMaxChannels = 8;

// Lock-free SPSC ring of fixed-size float frames (SwapQueue equivalent).
class SpscFrameQueue {
 public:
  SpscFrameQueue(int capacity, int samples, int channels)
      : capacity_(capacity + 1),
        frame_floats_(samples * channels),
        samples_(samples),
        channels_(channels),
        buffer_(static_cast<size_t>(capacity_) * frame_floats_),
        head_(0),
        tail_(0) {}

  int samples() const { return samples_; }
  int channels() const { return channels_; }

  // Producer side.
  bool Push(const float* data) {
    const int head = head_.load(std::memory_order_relaxed);
    const int next = Next(head);
    if (next == tail_.load(std::memory_order_acquire)) {
      dropped_.fetch_add(1, std::memory_order_relaxed);
      return false;  // full
    }
    std::memcpy(&buffer_[static_cast<size_t>(head) * frame_floats_], data,
                frame_floats_ * sizeof(float));
    head_.store(next, std::memory_order_release);
    return true;
  }

  // Consumer side.
  bool Pop(float* out) {
    const int tail = tail_.load(std::memory_order_relaxed);
    if (tail == head_.load(std::memory_order_acquire)) {
      return false;  // empty
    }
    std::memcpy(out, &buffer_[static_cast<size_t>(tail) * frame_floats_],
                frame_floats_ * sizeof(float));
    tail_.store(Next(tail), std::memory_order_release);
    return true;
  }

  int Size() const {
    int h = head_.load(std::memory_order_acquire);
    int t = tail_.load(std::memory_order_acquire);
    int d = h - t;
    return d >= 0 ? d : d + capacity_;
  }

  long Dropped() const { return dropped_.load(std::memory_order_relaxed); }

 private:
  int Next(int i) const { return (i + 1 == capacity_) ? 0 : i + 1; }

  const int capacity_;
  const int frame_floats_;
  const int samples_;
  const int channels_;
  std::vector<float> buffer_;
  alignas(64) std::atomic<int> head_;
  alignas(64) std::atomic<int> tail_;
  std::atomic<long> dropped_{0};
};

// RaceChecker equivalent: detects concurrent entry into a section that the
// API contract requires to be serialized (rtc_base/race_checker.h).
class RaceChecker {
 public:
  bool Enter() {
    int expected = 0;
    if (!depth_.compare_exchange_strong(expected, 1)) {
      races_.fetch_add(1, std::memory_order_relaxed);
      return false;
    }
    return true;
  }
  void Leave() { depth_.store(0, std::memory_order_release); }
  long races() const { return races_.load(std::memory_order_relaxed); }

 private:
  std::atomic<int> depth_{0};
  std::atomic<long> races_{0};
};

struct Stream {
  Stream(int queue_capacity, int samples, int cap_ch, int ren_ch)
      : capture(queue_capacity, samples, cap_ch),
        render(queue_capacity, samples, ren_ch),
        output(queue_capacity, samples, cap_ch) {}

  SpscFrameQueue capture;
  SpscFrameQueue render;
  SpscFrameQueue output;
  RaceChecker capture_race;
  std::atomic<long> frames_processed{0};
};

class StreamingPlane {
 public:
  StreamingPlane(int num_streams, int samples, int cap_ch, int ren_ch,
                 int queue_capacity)
      : samples_(samples), cap_ch_(cap_ch), ren_ch_(ren_ch) {
    streams_.reserve(num_streams);
    for (int i = 0; i < num_streams; ++i) {
      streams_.push_back(new Stream(queue_capacity, samples, cap_ch, ren_ch));
    }
  }
  ~StreamingPlane() {
    for (Stream* s : streams_) delete s;
  }

  int num_streams() const { return static_cast<int>(streams_.size()); }
  int samples() const { return samples_; }

  bool PushCapture(int stream, const float* data) {
    Stream* s = streams_[stream];
    if (!s->capture_race.Enter()) return false;
    bool ok = s->capture.Push(data);
    s->capture_race.Leave();
    return ok;
  }

  bool PushRender(int stream, const float* data) {
    return streams_[stream]->render.Push(data);
  }

  // Gathers one capture+render frame per ready stream into contiguous
  // batch tensors. `ready_mask` (num_streams) gets 1 for gathered rows;
  // rows for non-ready streams are zero-filled (the device step still runs
  // them; their outputs are not distributed).
  int CollectBatch(float* capture_out, float* render_out,
                   uint8_t* ready_mask) {
    const size_t cap_row = static_cast<size_t>(samples_) * cap_ch_;
    const size_t ren_row = static_cast<size_t>(samples_) * ren_ch_;
    int gathered = 0;
    for (size_t i = 0; i < streams_.size(); ++i) {
      Stream* s = streams_[i];
      float* crow = capture_out + i * cap_row;
      float* rrow = render_out + i * ren_row;
      // A stream is ready when a capture frame is available; a missing
      // render frame is substituted with silence (the reference runs the
      // capture pipeline regardless and the render queue may underrun).
      if (s->capture.Pop(crow)) {
        if (!s->render.Pop(rrow)) {
          std::memset(rrow, 0, ren_row * sizeof(float));
        }
        ready_mask[i] = 1;
        ++gathered;
      } else {
        std::memset(crow, 0, cap_row * sizeof(float));
        std::memset(rrow, 0, ren_row * sizeof(float));
        ready_mask[i] = 0;
      }
    }
    return gathered;
  }

  // Writes processed rows (where mask is set) to per-stream output queues.
  void DistributeBatch(const float* batch, const uint8_t* ready_mask) {
    const size_t row = static_cast<size_t>(samples_) * cap_ch_;
    for (size_t i = 0; i < streams_.size(); ++i) {
      if (!ready_mask[i]) continue;
      streams_[i]->output.Push(batch + i * row);
      streams_[i]->frames_processed.fetch_add(1,
                                              std::memory_order_relaxed);
    }
  }

  bool PopOutput(int stream, float* out) {
    return streams_[stream]->output.Pop(out);
  }

  long Races(int stream) const {
    return streams_[stream]->capture_race.races();
  }
  long Dropped(int stream) const {
    return streams_[stream]->capture.Dropped()
           + streams_[stream]->render.Dropped();
  }
  long FramesProcessed(int stream) const {
    return streams_[stream]->frames_processed.load(
        std::memory_order_relaxed);
  }
  int CaptureQueueSize(int stream) const {
    return streams_[stream]->capture.Size();
  }

 private:
  const int samples_;
  const int cap_ch_;
  const int ren_ch_;
  std::vector<Stream*> streams_;
};

}  // namespace

extern "C" {

void* wap_plane_create(int num_streams, int samples, int capture_channels,
                       int render_channels, int queue_capacity) {
  if (num_streams <= 0 || samples <= 0 || samples > kMaxFrameSamples ||
      capture_channels <= 0 || capture_channels > kMaxChannels ||
      render_channels <= 0 || render_channels > kMaxChannels ||
      queue_capacity <= 0) {
    return nullptr;
  }
  return new (std::nothrow) StreamingPlane(
      num_streams, samples, capture_channels, render_channels,
      queue_capacity);
}

void wap_plane_destroy(void* plane) {
  delete static_cast<StreamingPlane*>(plane);
}

int wap_push_capture(void* plane, int stream, const float* data) {
  return static_cast<StreamingPlane*>(plane)->PushCapture(stream, data) ? 1
                                                                        : 0;
}

int wap_push_render(void* plane, int stream, const float* data) {
  return static_cast<StreamingPlane*>(plane)->PushRender(stream, data) ? 1
                                                                       : 0;
}

int wap_collect_batch(void* plane, float* capture_out, float* render_out,
                      uint8_t* ready_mask) {
  return static_cast<StreamingPlane*>(plane)->CollectBatch(
      capture_out, render_out, ready_mask);
}

void wap_distribute_batch(void* plane, const float* batch,
                          const uint8_t* ready_mask) {
  static_cast<StreamingPlane*>(plane)->DistributeBatch(batch, ready_mask);
}

int wap_pop_output(void* plane, int stream, float* out) {
  return static_cast<StreamingPlane*>(plane)->PopOutput(stream, out) ? 1 : 0;
}

long wap_stream_races(void* plane, int stream) {
  return static_cast<StreamingPlane*>(plane)->Races(stream);
}

long wap_stream_dropped(void* plane, int stream) {
  return static_cast<StreamingPlane*>(plane)->Dropped(stream);
}

long wap_stream_frames_processed(void* plane, int stream) {
  return static_cast<StreamingPlane*>(plane)->FramesProcessed(stream);
}

int wap_capture_queue_size(void* plane, int stream) {
  return static_cast<StreamingPlane*>(plane)->CaptureQueueSize(stream);
}

}  // extern "C"
