// Native batch audio decoder (flac / m4a / mp3 / ogg / wav / ...) via
// ffmpeg's libavformat/libavcodec (system libraries, ffmpeg 5.x API).
//
// Role parity: the reference decodes with `torchaudio.load`
// (/root/reference/src/dataloader.py:98), whose backend is also
// ffmpeg/libsox C++ — real AudioSet/VGGSound archives are mostly flac/m4a,
// so WAV-only decode (csrc/wavloader.cpp) blocks those datasets. This
// library is the generic companion: first channel, float32 in [-1, 1],
// mean-subtracted, zero-padded/cropped to max_samples, exactly matching
// AudioJsonDataset.waveform semantics (aum_tpu/data/datasets.py).
//
// Also exposes a test-only encoder (aum_test_encode) so the test suite can
// synthesize flac/m4a fixtures without shipping binaries.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libavutil/samplefmt.h>
}

namespace {

// Extract channel 0 of one decoded frame as float32 into out (appending at
// *written, capped at max_samples); returns samples in the frame.
int64_t take_channel0(const AVFrame* fr, float* out, int64_t* written,
                      int64_t max_samples) {
  const int n = fr->nb_samples;
  const int nch = fr->ch_layout.nb_channels;
  const AVSampleFormat fmt = static_cast<AVSampleFormat>(fr->format);
  const bool planar = av_sample_fmt_is_planar(fmt);
  const uint8_t* p = fr->data[0];
  const int stride = planar ? 1 : nch;  // elements between channel-0 samples

  for (int i = 0; i < n && *written < max_samples; ++i, ++*written) {
    float v = 0.f;
    const int64_t idx = static_cast<int64_t>(i) * stride;
    switch (fmt) {
      case AV_SAMPLE_FMT_FLT:
      case AV_SAMPLE_FMT_FLTP:
        v = reinterpret_cast<const float*>(p)[idx];
        break;
      case AV_SAMPLE_FMT_DBL:
      case AV_SAMPLE_FMT_DBLP:
        v = static_cast<float>(reinterpret_cast<const double*>(p)[idx]);
        break;
      case AV_SAMPLE_FMT_S16:
      case AV_SAMPLE_FMT_S16P:
        v = reinterpret_cast<const int16_t*>(p)[idx] / 32768.0f;
        break;
      case AV_SAMPLE_FMT_S32:
      case AV_SAMPLE_FMT_S32P:
        v = reinterpret_cast<const int32_t*>(p)[idx] / 2147483648.0f;
        break;
      case AV_SAMPLE_FMT_U8:
      case AV_SAMPLE_FMT_U8P:
        v = (reinterpret_cast<const uint8_t*>(p)[idx] - 128) / 128.0f;
        break;
      default:
        return -1;
    }
    out[*written] = v;
  }
  return n;
}

int decode_one(const char* path, float* out, int64_t max_samples,
               int64_t* n_samples, int* sample_rate) {
  AVFormatContext* fmt_ctx = nullptr;
  if (avformat_open_input(&fmt_ctx, path, nullptr, nullptr) < 0) return -1;
  int status = 0;
  AVCodecContext* dec_ctx = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* fr = nullptr;
  int64_t written = 0, total = 0;

  do {
    if (avformat_find_stream_info(fmt_ctx, nullptr) < 0) { status = -2; break; }
    const AVCodec* dec = nullptr;
    const int si = av_find_best_stream(fmt_ctx, AVMEDIA_TYPE_AUDIO, -1, -1,
                                       &dec, 0);
    if (si < 0 || !dec) { status = -3; break; }
    AVStream* st = fmt_ctx->streams[si];
    dec_ctx = avcodec_alloc_context3(dec);
    if (!dec_ctx ||
        avcodec_parameters_to_context(dec_ctx, st->codecpar) < 0 ||
        avcodec_open2(dec_ctx, dec, nullptr) < 0) { status = -4; break; }

    pkt = av_packet_alloc();
    fr = av_frame_alloc();
    if (!pkt || !fr) { status = -5; break; }
    *sample_rate = dec_ctx->sample_rate;

    bool draining = false;
    while (status == 0) {
      if (!draining) {
        const int r = av_read_frame(fmt_ctx, pkt);
        if (r == AVERROR_EOF) {
          draining = true;
          avcodec_send_packet(dec_ctx, nullptr);  // flush
        } else if (r < 0) {
          status = -6;
          break;
        } else {
          if (pkt->stream_index == si) avcodec_send_packet(dec_ctx, pkt);
          av_packet_unref(pkt);
        }
      }
      for (;;) {
        const int r = avcodec_receive_frame(dec_ctx, fr);
        if (r == AVERROR(EAGAIN)) break;
        if (r == AVERROR_EOF) { draining = false; goto done; }
        if (r < 0) { status = -7; break; }
        const int64_t n = take_channel0(fr, out, &written, max_samples);
        if (n < 0) { status = -8; break; }
        total += n;
        av_frame_unref(fr);
      }
      if (draining && status == 0) continue;
      if (status != 0) break;
    }
  done:;
  } while (false);

  if (status == 0) {
    *n_samples = total;
    double sum = 0.0;
    const int64_t use = written;
    for (int64_t i = 0; i < use; ++i) sum += out[i];
    const float mean = use > 0 ? static_cast<float>(sum / use) : 0.f;
    for (int64_t i = 0; i < use; ++i) out[i] -= mean;
    for (int64_t i = use; i < max_samples; ++i) out[i] = 0.f;
  }
  if (fr) av_frame_free(&fr);
  if (pkt) av_packet_free(&pkt);
  if (dec_ctx) avcodec_free_context(&dec_ctx);
  avformat_close_input(&fmt_ctx);
  return status;
}

}  // namespace

extern "C" {

int aum_decode_audio(const char* path, float* out, int64_t max_samples,
                     int64_t* n_samples, int* sample_rate) {
  *n_samples = 0;
  *sample_rate = 0;
  return decode_one(path, out, max_samples, n_samples, sample_rate);
}

void aum_decode_audio_batch(const char** paths, int n, float* out,
                            int64_t max_samples, int64_t* n_samples,
                            int* sample_rates, int* statuses, int threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      statuses[i] = aum_decode_audio(
          paths[i], out + static_cast<int64_t>(i) * max_samples, max_samples,
          &n_samples[i], &sample_rates[i]);
    }
  };
  if (threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  for (int t = 0; t < threads && t < n; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

// ---- test-only fixture encoder ------------------------------------------
// Encodes mono float samples to `path` with the named codec ("flac" ->
// .flac, "aac" -> .m4a). Lets tests synthesize compressed fixtures instead
// of committing binaries. Returns 0 on success.
int aum_test_encode(const char* path, const char* codec_name,
                    const float* samples, int64_t n, int sample_rate) {
  const AVCodec* codec = avcodec_find_encoder_by_name(codec_name);
  if (!codec) return -1;
  AVFormatContext* oc = nullptr;
  if (avformat_alloc_output_context2(&oc, nullptr, nullptr, path) < 0 || !oc)
    return -2;

  int status = 0;
  AVCodecContext* enc = nullptr;
  AVFrame* fr = nullptr;
  AVPacket* pkt = nullptr;

  do {
    AVStream* st = avformat_new_stream(oc, nullptr);
    enc = avcodec_alloc_context3(codec);
    if (!st || !enc) { status = -3; break; }
    enc->sample_rate = sample_rate;
    av_channel_layout_default(&enc->ch_layout, 1);
    enc->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0]
                                         : AV_SAMPLE_FMT_FLTP;
    enc->time_base = {1, sample_rate};
    if (oc->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(enc, codec, nullptr) < 0) { status = -4; break; }
    if (avcodec_parameters_from_context(st->codecpar, enc) < 0) {
      status = -5; break;
    }
    st->time_base = enc->time_base;
    if (!(oc->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&oc->pb, path, AVIO_FLAG_WRITE) < 0) { status = -6; break; }
    if (avformat_write_header(oc, nullptr) < 0) { status = -7; break; }

    fr = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!fr || !pkt) { status = -8; break; }
    const int frame_size = enc->frame_size > 0 ? enc->frame_size : 4096;

    auto drain = [&](bool flush) {
      if (flush) avcodec_send_frame(enc, nullptr);
      for (;;) {
        const int r = avcodec_receive_packet(enc, pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
        if (r < 0) return -9;
        av_packet_rescale_ts(pkt, enc->time_base, oc->streams[0]->time_base);
        pkt->stream_index = 0;
        if (av_interleaved_write_frame(oc, pkt) < 0) return -10;
      }
    };

    int64_t pos = 0, pts = 0;
    while (pos < n && status == 0) {
      const int m = static_cast<int>(n - pos < frame_size ? n - pos
                                                          : frame_size);
      fr->nb_samples = m;
      fr->format = enc->sample_fmt;
      av_channel_layout_copy(&fr->ch_layout, &enc->ch_layout);
      fr->sample_rate = sample_rate;
      if (av_frame_get_buffer(fr, 0) < 0) { status = -11; break; }
      for (int i = 0; i < m; ++i) {
        const float v = samples[pos + i];
        switch (enc->sample_fmt) {
          case AV_SAMPLE_FMT_S16:
          case AV_SAMPLE_FMT_S16P: {
            float c = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
            reinterpret_cast<int16_t*>(fr->data[0])[i] =
                static_cast<int16_t>(c * 32767.0f);
            break;
          }
          case AV_SAMPLE_FMT_S32:
          case AV_SAMPLE_FMT_S32P: {
            float c = v < -1.f ? -1.f : (v > 1.f ? 1.f : v);
            reinterpret_cast<int32_t*>(fr->data[0])[i] =
                static_cast<int32_t>(c * 2147483520.0f);
            break;
          }
          case AV_SAMPLE_FMT_FLT:
          case AV_SAMPLE_FMT_FLTP:
            reinterpret_cast<float*>(fr->data[0])[i] = v;
            break;
          default:
            status = -12;
        }
      }
      if (status != 0) break;
      fr->pts = pts;
      pts += m;
      if (avcodec_send_frame(enc, fr) < 0) { status = -13; break; }
      status = drain(false);
      av_frame_unref(fr);
      pos += m;
    }
    if (status == 0) status = drain(true);
    if (status == 0 && av_write_trailer(oc) < 0) status = -14;
  } while (false);

  if (fr) av_frame_free(&fr);
  if (pkt) av_packet_free(&pkt);
  if (enc) avcodec_free_context(&enc);
  if (oc && !(oc->oformat->flags & AVFMT_NOFILE) && oc->pb)
    avio_closep(&oc->pb);
  avformat_free_context(oc);
  return status;
}

}  // extern "C"
