// C API over the reference AudioProcessing for conformance oracle use.
#include <cstring>
#include <cstdint>
#include <vector>
#include <memory>
#include <string>
#include "api/audio/audio_processing.h"
#include "api/audio/builtin_audio_processing_builder.h"
#include "api/audio/echo_canceller3_config.h"
#include "api/environment/environment_factory.h"
#include "api/scoped_refptr.h"
#include "modules/audio_processing/logging/apm_data_dumper.h"

using namespace webrtc;

struct ApmHandle {
  scoped_refptr<AudioProcessing> apm;
};

extern "C" {

void* apm_create2(int aec, int mobile, int ns, int ns_level, int agc1,
                  int agc1_mode, int agc2, int hpf,
                  int agc1_analog_controller, int max_internal_rate) {
  AudioProcessing::Config cfg;
  cfg.gain_controller1.analog_gain_controller.enabled =
      agc1_analog_controller != 0;
  cfg.pipeline.maximum_internal_processing_rate = max_internal_rate;
  cfg.echo_canceller.enabled = aec != 0;
  cfg.echo_canceller.mobile_mode = mobile != 0;
  cfg.noise_suppression.enabled = ns != 0;
  cfg.noise_suppression.level =
      static_cast<AudioProcessing::Config::NoiseSuppression::Level>(ns_level);
  cfg.gain_controller1.enabled = agc1 != 0;
  cfg.gain_controller1.mode =
      static_cast<AudioProcessing::Config::GainController1::Mode>(agc1_mode);
  cfg.gain_controller2.enabled = agc2 != 0;
  cfg.high_pass_filter.enabled = hpf != 0;
  auto h = new ApmHandle;
  h->apm = BuiltinAudioProcessingBuilder(cfg).Build(CreateEnvironment());
  return h;
}

void* apm_create(int aec, int mobile, int ns, int ns_level, int agc1,
                 int agc1_mode, int agc2, int hpf) {
  return apm_create2(aec, mobile, ns, ns_level, agc1, agc1_mode, agc2, hpf,
                     /*agc1_analog_controller=*/0,
                     /*max_internal_rate=*/48000);
}

// deinterleaved float [-1,1): channel pointers packed contiguously:
// data laid out as ch0[0..n), ch1[0..n), ...
int apm_process_reverse(void* p, const float* data, int rate, int ch) {
  auto* h = static_cast<ApmHandle*>(p);
  int n = rate / 100;
  const float* srcs[8];
  for (int c = 0; c < ch; ++c) srcs[c] = data + c * n;
  StreamConfig sc(rate, ch);
  // in-place allowed? use separate out buffers
  static thread_local std::vector<float> outbuf;
  outbuf.resize(n * ch);
  float* dsts[8];
  for (int c = 0; c < ch; ++c) dsts[c] = outbuf.data() + c * n;
  return h->apm->ProcessReverseStream(srcs, sc, sc, dsts);
}

int apm_set_delay(void* p, int delay_ms) {
  return static_cast<ApmHandle*>(p)->apm->set_stream_delay_ms(delay_ms);
}

void apm_set_analog_level(void* p, int level) {
  static_cast<ApmHandle*>(p)->apm->set_stream_analog_level(level);
}

int apm_recommended_level(void* p) {
  return static_cast<ApmHandle*>(p)->apm->recommended_stream_analog_level();
}

int apm_process(void* p, const float* data, int rate, int ch, float* out) {
  auto* h = static_cast<ApmHandle*>(p);
  int n = rate / 100;
  const float* srcs[8];
  float* dsts[8];
  for (int c = 0; c < ch; ++c) {
    srcs[c] = data + c * n;
    dsts[c] = out + c * n;
  }
  StreamConfig sc(rate, ch);
  return h->apm->ProcessStream(srcs, sc, sc, dsts);
}

// stats: [erl, erle, delay_ms, residual_echo_likelihood, recent_max,
//         output_rms_dbfs, voice_detected, delay_median]
void apm_get_stats(void* p, double* out) {
  auto s = static_cast<ApmHandle*>(p)->apm->GetStatistics();
  out[0] = s.echo_return_loss.value_or(-999);
  out[1] = s.echo_return_loss_enhancement.value_or(-999);
  out[2] = s.delay_ms.value_or(-999);
  out[3] = s.residual_echo_likelihood.value_or(-999);
  out[4] = s.residual_echo_likelihood_recent_max.value_or(-999);
  out[5] = -999;
  out[6] = s.voice_detected.value_or(false) ? 1.0 : 0.0;
  out[7] = s.delay_median_ms.value_or(-999);
}

void apm_set_runtime_capture_output_used(void* p, int used) {
  static_cast<ApmHandle*>(p)->apm->SetRuntimeSetting(
      AudioProcessing::RuntimeSetting::CreateCaptureOutputUsedSetting(used));
}


// int16 interleaved entries (audio_processing.h:542 ProcessStream int16).
int apm_process_i16(void* p, const int16_t* data, int rate, int ch,
                    int16_t* out) {
  auto* h = static_cast<ApmHandle*>(p);
  StreamConfig sc(rate, ch);
  return h->apm->ProcessStream(data, sc, sc, out);
}

int apm_process_reverse_i16(void* p, const int16_t* data, int rate, int ch) {
  auto* h = static_cast<ApmHandle*>(p);
  StreamConfig sc(rate, ch);
  static thread_local std::vector<int16_t> outbuf;
  outbuf.resize((rate / 100) * ch);
  return h->apm->ProcessReverseStream(data, sc, sc, outbuf.data());
}

void apm_destroy(void* p) { delete static_cast<ApmHandle*>(p); }

void apm_dumper_set_dir(const char* dir) {
  ApmDataDumper::SetOutputDirectory(dir);
  ApmDataDumper::SetActivated(true);
}

}  // extern "C"
