// PTS-indexed random-access video decoder (decord-equivalent, SURVEY.md §2b N1).
//
// The reference leans on decord's C++ FFmpeg wrapper for every video touch:
// random-access get_batch, the _frame_pts table, and streaming cursor reads
// (livecc-utils video_process_patch.py:40-42,79). This is the TPU build's
// native equivalent: a small C API over libavformat/libavcodec/libswscale
// exposed to Python via ctypes (no pybind11 in the image).
//
// Design:
//   * open() demuxes the container once WITHOUT decoding, recording every
//     video packet's pts + keyframe flag -> O(1)-RAM frame index sorted by
//     display order (the _frame_pts equivalent).
//   * get_batch(indices) decodes with a monotonic cursor: seek only when a
//     target precedes the cursor or jumps far ahead; otherwise decode
//     forward. Streaming reads (monotonically increasing 2-frame chunks)
//     therefore never re-seek.
//   * frames are converted to RGB24 (and optionally scaled) by libswscale
//     inside the library — Python receives ready [T, H, W, 3] uint8.
//   * encode_test_video() writes a synthetic clip with the built-in mpeg4
//     encoder so tests need no external assets or ffmpeg binary.
//
// Build: make -C livecc_tpu/vision_io/native

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
#include <libswresample/swresample.h>
}

namespace {

struct FrameEntry {
  int64_t pts;       // stream timebase units
  bool keyframe;
};

// In-memory source for bytes-opened readers (the reference accepts
// remote_loader-produced bytes, video_process_patch.py:39-44).
struct MemBuf {
  std::vector<uint8_t> data;
  int64_t pos = 0;
};

struct Reader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;
  AVRational time_base{1, 1};
  double avg_fps = 0.0;
  std::vector<FrameEntry> index;       // sorted by pts (display order)
  // decode cursor
  int64_t cursor_pts = INT64_MIN;      // pts of last decoded frame
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  SwsContext* sws = nullptr;
  int sws_w = -1, sws_h = -1;
  // bytes-backed source (owned)
  MemBuf* mem = nullptr;
  AVIOContext* avio = nullptr;
  std::string error;
};

std::mutex g_mutex;
std::unordered_map<int64_t, Reader*> g_readers;
int64_t g_next_handle = 1;

thread_local std::string tl_error;

void set_error(const std::string& e) { tl_error = e; }

int open_codec(Reader* r) {
  AVStream* st = r->fmt->streams[r->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) return -1;
  r->codec = avcodec_alloc_context3(dec);
  if (avcodec_parameters_to_context(r->codec, st->codecpar) < 0) return -1;
  r->codec->thread_count = 2;  // mirrors decord num_threads=2
  if (avcodec_open2(r->codec, dec, nullptr) < 0) return -1;
  return 0;
}

// Decode forward until a frame with pts >= target is produced.
// Returns 0 and leaves the frame in r->frame on success.
int decode_until(Reader* r, int64_t target_pts) {
  while (true) {
    int ret = avcodec_receive_frame(r->codec, r->frame);
    if (ret == 0) {
      int64_t pts = r->frame->best_effort_timestamp;
      if (pts == AV_NOPTS_VALUE) pts = r->frame->pts;
      r->cursor_pts = pts;
      if (pts >= target_pts) return 0;
      continue;
    }
    if (ret == AVERROR(EAGAIN)) {
      while (true) {
        int rr = av_read_frame(r->fmt, r->pkt);
        if (rr < 0) {
          avcodec_send_packet(r->codec, nullptr);  // flush
          break;
        }
        if (r->pkt->stream_index == r->stream_index) {
          int sr = avcodec_send_packet(r->codec, r->pkt);
          av_packet_unref(r->pkt);
          if (sr < 0 && sr != AVERROR(EAGAIN)) return -1;
          break;
        }
        av_packet_unref(r->pkt);
      }
      continue;
    }
    if (ret == AVERROR_EOF) {
      // target beyond the last frame: keep the last decoded one if any
      return r->cursor_pts != INT64_MIN ? 0 : -1;
    }
    return -1;
  }
}

int seek_to(Reader* r, int64_t target_pts) {
  if (av_seek_frame(r->fmt, r->stream_index, target_pts, AVSEEK_FLAG_BACKWARD) < 0)
    return -1;
  avcodec_flush_buffers(r->codec);
  r->cursor_pts = INT64_MIN;
  return 0;
}

void free_reader(Reader* r) {
  if (r->sws) sws_freeContext(r->sws);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->codec) avcodec_free_context(&r->codec);
  if (r->fmt) avformat_close_input(&r->fmt);
  if (r->avio) {
    av_freep(&r->avio->buffer);
    avio_context_free(&r->avio);
  }
  delete r->mem;
  delete r;
}

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemBuf* m = static_cast<MemBuf*>(opaque);
  int64_t remain = (int64_t)m->data.size() - m->pos;
  if (remain <= 0) return AVERROR_EOF;
  int nn = (int)std::min<int64_t>(buf_size, remain);
  std::memcpy(buf, m->data.data() + m->pos, nn);
  m->pos += nn;
  return nn;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemBuf* m = static_cast<MemBuf*>(opaque);
  if (whence == AVSEEK_SIZE) return (int64_t)m->data.size();
  whence &= ~AVSEEK_FORCE;
  int64_t base = whence == SEEK_SET ? 0
               : whence == SEEK_CUR ? m->pos
                                    : (int64_t)m->data.size();
  int64_t np = base + offset;
  if (np < 0 || np > (int64_t)m->data.size()) return -1;
  m->pos = np;
  return np;
}

// Shared tail of vr_open / vr_open_bytes: r->fmt is an opened input.
int64_t finish_open(Reader* r) {
  if (avformat_find_stream_info(r->fmt, nullptr) < 0) {
    set_error("no stream info");
    free_reader(r);
    return 0;
  }
  r->stream_index =
      av_find_best_stream(r->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (r->stream_index < 0) {
    set_error("no video stream");
    free_reader(r);
    return 0;
  }
  AVStream* st = r->fmt->streams[r->stream_index];
  r->time_base = st->time_base;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  r->avg_fps = fr.den ? av_q2d(fr) : 0.0;

  // Pass 1: demux-only packet scan -> pts index in display order.
  AVPacket* pkt = av_packet_alloc();
  while (av_read_frame(r->fmt, pkt) >= 0) {
    if (pkt->stream_index == r->stream_index) {
      int64_t pts = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
      r->index.push_back({pts, (pkt->flags & AV_PKT_FLAG_KEY) != 0});
    }
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  std::sort(r->index.begin(), r->index.end(),
            [](const FrameEntry& a, const FrameEntry& b) { return a.pts < b.pts; });
  if (r->index.empty()) {
    set_error("no frames");
    free_reader(r);
    return 0;
  }
  av_seek_frame(r->fmt, r->stream_index, r->index.front().pts, AVSEEK_FLAG_BACKWARD);

  if (open_codec(r) < 0) {
    set_error("cannot open codec");
    free_reader(r);
    return 0;
  }
  r->frame = av_frame_alloc();
  r->pkt = av_packet_alloc();

  std::lock_guard<std::mutex> lock(g_mutex);
  int64_t h = g_next_handle++;
  g_readers[h] = r;
  return h;
}

}  // namespace

extern "C" {

const char* vr_last_error() { return tl_error.c_str(); }

int64_t vr_open(const char* path) {
  Reader* r = new Reader();
  if (avformat_open_input(&r->fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    delete r;
    return 0;
  }
  return finish_open(r);
}

// Open from an in-memory container (remote-loader bytes,
// video_process_patch.py:39-44 semantics). The buffer is copied; the caller
// may free it immediately.
int64_t vr_open_bytes(const uint8_t* data, int64_t size) {
  Reader* r = new Reader();
  r->mem = new MemBuf{std::vector<uint8_t>(data, data + size), 0};
  constexpr int kBufSize = 1 << 16;
  unsigned char* buf = static_cast<unsigned char*>(av_malloc(kBufSize));
  r->avio = avio_alloc_context(buf, kBufSize, 0, r->mem, mem_read, nullptr, mem_seek);
  r->fmt = avformat_alloc_context();
  r->fmt->pb = r->avio;
  if (avformat_open_input(&r->fmt, nullptr, nullptr, nullptr) < 0) {
    set_error("cannot open bytes");
    free_reader(r);   // fmt already freed by avformat_open_input; avio/mem remain
    return 0;
  }
  return finish_open(r);
}

int64_t vr_num_frames(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_readers.find(handle);
  return it == g_readers.end() ? -1 : (int64_t)it->second->index.size();
}

double vr_avg_fps(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_readers.find(handle);
  return it == g_readers.end() ? -1.0 : it->second->avg_fps;
}

int vr_frame_size(int64_t handle, int* out_h, int* out_w) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_readers.find(handle);
  if (it == g_readers.end()) return -1;
  *out_h = it->second->codec->height;
  *out_w = it->second->codec->width;
  return 0;
}

// Fills out[n] with per-frame PTS seconds (display order) — the reference's
// vr._frame_pts[:, 1] table.
int vr_pts_seconds(int64_t handle, double* out) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_readers.find(handle);
  if (it == g_readers.end()) return -1;
  Reader* r = it->second;
  for (size_t i = 0; i < r->index.size(); ++i)
    out[i] = r->index[i].pts * av_q2d(r->time_base);
  return 0;
}

// Decode frames at the given display-order indices into out (RGB24,
// [n, out_h, out_w, 3] C-contiguous). out_h/out_w of 0 mean native size.
// Indices may repeat (FRAME_FACTOR padding) and must be non-decreasing for
// the fast path; arbitrary order still works via seeks.
int vr_get_batch(int64_t handle, const int64_t* indices, int64_t n,
                 uint8_t* out, int out_h, int out_w) {
  Reader* r;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_readers.find(handle);
    if (it == g_readers.end()) { set_error("bad handle"); return -1; }
    r = it->second;
  }
  if (out_h <= 0) out_h = r->codec->height;
  if (out_w <= 0) out_w = r->codec->width;
  const size_t frame_bytes = (size_t)out_h * out_w * 3;
  // libswscale's SIMD paths may write a full aligned chunk at the end of
  // each row: scaling directly into the caller's tightly-packed numpy
  // buffer with stride out_w*3 corrupts the heap ("corrupted size vs.
  // prev_size"). Scale into an aligned padded scratch row block, then
  // copy packed rows out.
  const int pad_stride = (out_w * 3 + 63) & ~63;
  std::unique_ptr<uint8_t, decltype(&av_free)> scratch(
      static_cast<uint8_t*>(av_malloc((size_t)pad_stride * out_h + 64)), av_free);
  if (!scratch) { set_error("scratch alloc failed"); return -1; }

  int64_t last_idx = INT64_MIN;
  for (int64_t i = 0; i < n; ++i) {
    int64_t idx = indices[i];
    if (idx < 0 || idx >= (int64_t)r->index.size()) { set_error("index out of range"); return -1; }
    if (idx == last_idx) {  // repeated frame: copy previous output
      std::memcpy(out + i * frame_bytes, out + (i - 1) * frame_bytes, frame_bytes);
      continue;
    }
    int64_t target = r->index[idx].pts;
    if (target < r->cursor_pts || target == INT64_MIN) {
      if (seek_to(r, target) < 0) { set_error("seek failed"); return -1; }
    } else if (r->cursor_pts != INT64_MIN) {
      // Far forward jump: seek if the nearest keyframe at/below target is
      // ahead of the cursor (cheaper than decoding every frame between).
      int64_t key_pts = INT64_MIN;
      for (int64_t j = idx; j >= 0; --j) {
        if (r->index[j].keyframe) { key_pts = r->index[j].pts; break; }
      }
      if (key_pts != INT64_MIN && key_pts > r->cursor_pts) {
        if (seek_to(r, target) < 0) { set_error("seek failed"); return -1; }
      }
    }
    if (r->cursor_pts == INT64_MIN || r->cursor_pts < target) {
      if (decode_until(r, target) < 0) { set_error("decode failed"); return -1; }
    }
    // convert r->frame -> RGB24 (+scale)
    if (!r->sws || r->sws_w != out_w || r->sws_h != out_h) {
      if (r->sws) sws_freeContext(r->sws);
      r->sws = sws_getContext(r->codec->width, r->codec->height,
                              (AVPixelFormat)r->frame->format, out_w, out_h,
                              AV_PIX_FMT_RGB24, SWS_BICUBIC, nullptr, nullptr, nullptr);
      r->sws_w = out_w;
      r->sws_h = out_h;
      if (!r->sws) { set_error("sws_getContext failed"); return -1; }
    }
    uint8_t* dst[1] = {scratch.get()};
    int dst_stride[1] = {pad_stride};
    sws_scale(r->sws, r->frame->data, r->frame->linesize, 0, r->codec->height,
              dst, dst_stride);
    for (int y = 0; y < out_h; ++y)
      std::memcpy(out + i * frame_bytes + (size_t)y * out_w * 3,
                  scratch.get() + (size_t)y * pad_stride, (size_t)out_w * 3);
    last_idx = idx;
  }
  return 0;
}

void vr_close(int64_t handle) {
  Reader* r = nullptr;
  {
    std::lock_guard<std::mutex> lock(g_mutex);
    auto it = g_readers.find(handle);
    if (it == g_readers.end()) return;
    r = it->second;
    g_readers.erase(it);
  }
  free_reader(r);
}

// --- audio (decord AudioReader equivalent, N1) ------------------------------
// Decodes the first audio stream to mono float32 PCM at the requested sample
// rate (libswresample). Reference uses decord's AudioReader for WhisperX
// input (data/production/distributed_whisperx.py:14-16).

struct AudioBuf {
  std::vector<float> samples;
};

std::unordered_map<int64_t, AudioBuf*> g_audio;

int64_t vr_audio_open_impl(AVFormatContext* fmt, int sample_rate) {
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    set_error("no stream info");
    avformat_close_input(&fmt);
    return 0;
  }
  int si = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (si < 0) {
    set_error("no audio stream");
    avformat_close_input(&fmt);
    return 0;
  }
  AVStream* st = fmt->streams[si];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  AVCodecContext* c = avcodec_alloc_context3(dec);
  avcodec_parameters_to_context(c, st->codecpar);
  if (!dec || avcodec_open2(c, dec, nullptr) < 0) {
    set_error("audio codec open failed");
    avcodec_free_context(&c);
    avformat_close_input(&fmt);
    return 0;
  }

  SwrContext* swr = nullptr;
  AVChannelLayout mono = AV_CHANNEL_LAYOUT_MONO;
  AVChannelLayout in_layout;
  av_channel_layout_copy(&in_layout, &c->ch_layout);
  if (in_layout.nb_channels == 0) av_channel_layout_default(&in_layout, 1);
  swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLT, sample_rate,
                      &in_layout, c->sample_fmt,
                      c->sample_rate > 0 ? c->sample_rate : sample_rate,
                      0, nullptr);
  if (!swr || swr_init(swr) < 0) {
    set_error("swr init failed");
    if (swr) swr_free(&swr);
    avcodec_free_context(&c);
    avformat_close_input(&fmt);
    return 0;
  }

  AudioBuf* out = new AudioBuf();
  AVPacket* pkt = av_packet_alloc();
  AVFrame* fr = av_frame_alloc();
  std::vector<float> tmp;
  auto drain = [&](AVFrame* f) {
    int max_out = f ? swr_get_out_samples(swr, f->nb_samples)
                    : (int)swr_get_delay(swr, sample_rate) + 256;
    if (max_out <= 0) max_out = 256;
    tmp.resize((size_t)max_out);
    uint8_t* outp[1] = {reinterpret_cast<uint8_t*>(tmp.data())};
    int got = swr_convert(swr, outp, max_out,
                          f ? const_cast<const uint8_t**>(f->extended_data) : nullptr,
                          f ? f->nb_samples : 0);
    if (got > 0) out->samples.insert(out->samples.end(), tmp.begin(), tmp.begin() + got);
  };
  bool eof = false;
  while (!eof) {
    int rr = av_read_frame(fmt, pkt);
    if (rr < 0) {
      avcodec_send_packet(c, nullptr);
      eof = true;
    } else if (pkt->stream_index == si) {
      avcodec_send_packet(c, pkt);
    }
    av_packet_unref(pkt);
    while (avcodec_receive_frame(c, fr) == 0) drain(fr);
  }
  drain(nullptr);  // flush the resampler

  av_frame_free(&fr);
  av_packet_free(&pkt);
  swr_free(&swr);
  av_channel_layout_uninit(&in_layout);
  avcodec_free_context(&c);
  avformat_close_input(&fmt);

  std::lock_guard<std::mutex> lock(g_mutex);
  int64_t h = g_next_handle++;
  g_audio[h] = out;
  return h;
}

int64_t vr_audio_open(const char* path, int sample_rate) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
    set_error(std::string("cannot open ") + path);
    return 0;
  }
  return vr_audio_open_impl(fmt, sample_rate);
}

int64_t vr_audio_len(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_audio.find(handle);
  return it == g_audio.end() ? -1 : (int64_t)it->second->samples.size();
}

int vr_audio_copy(int64_t handle, float* out) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_audio.find(handle);
  if (it == g_audio.end()) return -1;
  std::memcpy(out, it->second->samples.data(), it->second->samples.size() * sizeof(float));
  return 0;
}

void vr_audio_close(int64_t handle) {
  std::lock_guard<std::mutex> lock(g_mutex);
  auto it = g_audio.find(handle);
  if (it == g_audio.end()) return;
  delete it->second;
  g_audio.erase(it);
}

// --- test-asset encoder (mpeg4, no external binaries needed) ---------------
// frames: [n, h, w, 3] RGB24. fps must be > 0.
int vr_encode_test_video(const char* path, const uint8_t* frames, int64_t n,
                         int h, int w, int fps) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) { set_error("alloc output"); return -1; }
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!enc) { set_error("no mpeg4 encoder"); return -1; }
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* c = avcodec_alloc_context3(enc);
  c->width = w;
  c->height = h;
  c->pix_fmt = AV_PIX_FMT_YUV420P;
  c->time_base = {1, fps};
  c->framerate = {fps, 1};
  c->gop_size = 12;
  c->bit_rate = 2'000'000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(c, enc, nullptr) < 0) { set_error("encoder open"); return -1; }
  avcodec_parameters_from_context(st->codecpar, c);
  st->time_base = c->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
    set_error("avio_open");
    return -1;
  }
  if (avformat_write_header(fmt, nullptr) < 0) { set_error("write header"); return -1; }

  SwsContext* sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  AVFrame* fr = av_frame_alloc();
  fr->format = AV_PIX_FMT_YUV420P;
  fr->width = w;
  fr->height = h;
  av_frame_get_buffer(fr, 0);
  AVPacket* pkt = av_packet_alloc();

  auto flush = [&](AVFrame* f) -> int {
    if (avcodec_send_frame(c, f) < 0) return -1;
    while (true) {
      int ret = avcodec_receive_packet(c, pkt);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
      if (ret < 0) return -1;
      pkt->duration = 1;  // one frame in codec time_base (1/fps)
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  // sws_scale SIMD reads can overrun a tightly-packed source row; stage
  // each input frame in an aligned padded buffer (mirror of the decode-side
  // scratch fix in vr_get_batch).
  const int in_stride = (w * 3 + 63) & ~63;
  std::unique_ptr<uint8_t, decltype(&av_free)> in_buf(
      static_cast<uint8_t*>(av_malloc((size_t)in_stride * h + 64)), av_free);
  if (!in_buf) { set_error("scratch alloc failed"); return -1; }
  for (int64_t i = 0; i < n; ++i) {
    for (int y = 0; y < h; ++y)
      std::memcpy(in_buf.get() + (size_t)y * in_stride,
                  frames + (size_t)i * h * w * 3 + (size_t)y * w * 3,
                  (size_t)w * 3);
    const uint8_t* src[1] = {in_buf.get()};
    int src_stride[1] = {in_stride};
    av_frame_make_writable(fr);
    sws_scale(sws, src, src_stride, 0, h, fr->data, fr->linesize);
    fr->pts = i;
    if (flush(fr) < 0) { set_error("encode"); return -1; }
  }
  flush(nullptr);
  av_write_trailer(fmt);
  sws_freeContext(sws);
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&c);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

// Write mono float samples as a 16-bit WAV (test asset for the audio path).
int vr_encode_test_audio(const char* path, const float* samples, int64_t n,
                         int sample_rate) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, "wav", path);
  if (!fmt) { set_error("alloc wav output"); return -1; }
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_PCM_S16LE);
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* c = avcodec_alloc_context3(enc);
  c->sample_rate = sample_rate;
  av_channel_layout_default(&c->ch_layout, 1);
  c->sample_fmt = AV_SAMPLE_FMT_S16;
  c->time_base = {1, sample_rate};
  auto fail = [&](const char* msg) {
    set_error(msg);
    avcodec_free_context(&c);
    if (fmt->pb) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
    return -1;
  };
  if (avcodec_open2(c, enc, nullptr) < 0) return fail("pcm encoder open");
  avcodec_parameters_from_context(st->codecpar, c);
  st->time_base = c->time_base;
  if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return fail("avio_open");
  if (avformat_write_header(fmt, nullptr) < 0) return fail("wav header");

  AVFrame* fr = av_frame_alloc();
  AVPacket* pkt = av_packet_alloc();
  const int chunk = 4096;
  for (int64_t pos = 0; pos < n; pos += chunk) {
    int cnt = (int)std::min<int64_t>(chunk, n - pos);
    fr->nb_samples = cnt;
    fr->format = AV_SAMPLE_FMT_S16;
    av_channel_layout_default(&fr->ch_layout, 1);
    fr->sample_rate = sample_rate;
    av_frame_get_buffer(fr, 0);
    int16_t* dst = reinterpret_cast<int16_t*>(fr->data[0]);
    for (int i = 0; i < cnt; ++i) {
      float s = samples[pos + i];
      s = s < -1.f ? -1.f : (s > 1.f ? 1.f : s);
      dst[i] = (int16_t)(s * 32767.f);
    }
    fr->pts = pos;
    avcodec_send_frame(c, fr);
    while (avcodec_receive_packet(c, pkt) == 0) {
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
    av_frame_unref(fr);
  }
  avcodec_send_frame(c, nullptr);
  while (avcodec_receive_packet(c, pkt) == 0) {
    av_packet_rescale_ts(pkt, c->time_base, st->time_base);
    pkt->stream_index = st->index;
    av_interleaved_write_frame(fmt, pkt);
    av_packet_unref(pkt);
  }
  av_write_trailer(fmt);
  av_frame_free(&fr);
  av_packet_free(&pkt);
  avcodec_free_context(&c);
  avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

// --- muxed render output (reference demo/render/video.py:186-200) -----------
// One mp4 with BOTH streams: mpeg4 video from RGB frames + AAC audio from
// mono float PCM (the TTS track). Streams are interleaved by timestamp so
// libavformat never has to buffer a whole stream. Input samples are
// converted (and resampled when the input rate isn't AAC-representable)
// with libswresample.
int vr_encode_video_with_audio(const char* path, const uint8_t* frames,
                               int64_t n, int h, int w, int fps,
                               const float* samples, int64_t n_samples,
                               int sample_rate) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) { set_error("alloc output"); return -1; }
  const AVCodec* venc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  const AVCodec* aenc = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!venc || !aenc) { set_error("mpeg4/aac encoder missing"); return -1; }

  AVStream* vst = avformat_new_stream(fmt, nullptr);
  AVCodecContext* vc = avcodec_alloc_context3(venc);
  vc->width = w;
  vc->height = h;
  vc->pix_fmt = AV_PIX_FMT_YUV420P;
  vc->time_base = {1, fps};
  vc->framerate = {fps, 1};
  vc->gop_size = 12;
  vc->bit_rate = 2'000'000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    vc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(vc, venc, nullptr) < 0) { set_error("video encoder open"); return -1; }
  avcodec_parameters_from_context(vst->codecpar, vc);
  vst->time_base = vc->time_base;

  // pick an AAC-supported rate (pass-through when possible, else nearest)
  int out_rate = sample_rate;
  if (aenc->supported_samplerates) {
    int best = aenc->supported_samplerates[0];
    bool exact = false;
    for (const int* r = aenc->supported_samplerates; *r; ++r) {
      if (*r == sample_rate) { exact = true; break; }
      if (std::abs(*r - sample_rate) < std::abs(best - sample_rate)) best = *r;
    }
    out_rate = exact ? sample_rate : best;
  }
  AVStream* ast = avformat_new_stream(fmt, nullptr);
  AVCodecContext* ac = avcodec_alloc_context3(aenc);
  ac->sample_rate = out_rate;
  ac->sample_fmt = AV_SAMPLE_FMT_FLTP;
  av_channel_layout_default(&ac->ch_layout, 1);
  ac->bit_rate = 96'000;
  ac->time_base = {1, out_rate};
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    ac->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(ac, aenc, nullptr) < 0) { set_error("aac encoder open"); return -1; }
  avcodec_parameters_from_context(ast->codecpar, ac);
  ast->time_base = ac->time_base;

  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
    set_error("avio_open");
    return -1;
  }
  if (avformat_write_header(fmt, nullptr) < 0) { set_error("write header"); return -1; }

  // resample/convert the whole (short) TTS track to FLTP at out_rate
  SwrContext* swr = nullptr;
  AVChannelLayout mono;
  av_channel_layout_default(&mono, 1);
  if (swr_alloc_set_opts2(&swr, &mono, AV_SAMPLE_FMT_FLTP, out_rate, &mono,
                          AV_SAMPLE_FMT_FLT, sample_rate, 0, nullptr) < 0 ||
      swr_init(swr) < 0) {
    set_error("swr init");
    return -1;
  }
  int64_t max_out = av_rescale_rnd(n_samples + 4096, out_rate, sample_rate, AV_ROUND_UP);
  std::vector<float> audio((size_t)max_out, 0.f);
  uint8_t* out_planes[1] = {reinterpret_cast<uint8_t*>(audio.data())};
  const uint8_t* in_planes[1] = {reinterpret_cast<const uint8_t*>(samples)};
  int got = swr_convert(swr, out_planes, (int)max_out, in_planes, (int)n_samples);
  if (got >= 0) {
    uint8_t* tail[1] = {reinterpret_cast<uint8_t*>(audio.data() + got)};
    int extra = swr_convert(swr, tail, (int)(max_out - got), nullptr, 0);
    if (extra > 0) got += extra;
  }
  swr_free(&swr);
  if (got < 0) { set_error("swr convert"); return -1; }
  int64_t n_audio = got;

  AVPacket* pkt = av_packet_alloc();
  auto drain = [&](AVCodecContext* c, AVStream* st, int64_t dur) -> int {
    while (true) {
      int ret = avcodec_receive_packet(c, pkt);
      if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
      if (ret < 0) return -1;
      if (pkt->duration == 0) pkt->duration = dur;  // mov muxer needs the
      // last sample's duration; a 0 makes the final video frame vanish
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  SwsContext* sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h,
                                   AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                   nullptr, nullptr);
  AVFrame* vf = av_frame_alloc();
  vf->format = AV_PIX_FMT_YUV420P;
  vf->width = w;
  vf->height = h;
  av_frame_get_buffer(vf, 0);
  AVFrame* af = av_frame_alloc();
  const int in_stride = (w * 3 + 63) & ~63;
  std::unique_ptr<uint8_t, decltype(&av_free)> in_buf(
      static_cast<uint8_t*>(av_malloc((size_t)in_stride * h + 64)), av_free);
  if (!in_buf) { set_error("scratch alloc failed"); return -1; }

  const int afsz = ac->frame_size > 0 ? ac->frame_size : 1024;
  int64_t vi = 0, apos = 0;
  bool v_done = false, a_done = false;
  while (!v_done || !a_done) {
    double vt = v_done ? 1e30 : (double)vi / fps;
    double at = a_done ? 1e30 : (double)apos / out_rate;
    if (vt <= at) {
      if (vi < n) {
        for (int y = 0; y < h; ++y)
          std::memcpy(in_buf.get() + (size_t)y * in_stride,
                      frames + (size_t)vi * h * w * 3 + (size_t)y * w * 3,
                      (size_t)w * 3);
        const uint8_t* src[1] = {in_buf.get()};
        int src_stride[1] = {in_stride};
        av_frame_make_writable(vf);
        sws_scale(sws, src, src_stride, 0, h, vf->data, vf->linesize);
        vf->pts = vi++;
        if (avcodec_send_frame(vc, vf) < 0 || drain(vc, vst, 1) < 0) {
          set_error("video encode");
          return -1;
        }
      } else {
        avcodec_send_frame(vc, nullptr);
        if (drain(vc, vst, 1) < 0) { set_error("video flush"); return -1; }
        v_done = true;
      }
    } else {
      if (apos < n_audio) {
        int cnt = (int)std::min<int64_t>(afsz, n_audio - apos);
        af->nb_samples = afsz;  // full frame; pad the tail with silence
        af->format = AV_SAMPLE_FMT_FLTP;
        av_channel_layout_default(&af->ch_layout, 1);
        af->sample_rate = out_rate;
        av_frame_get_buffer(af, 0);
        float* dst = reinterpret_cast<float*>(af->data[0]);
        std::memcpy(dst, audio.data() + apos, (size_t)cnt * sizeof(float));
        if (cnt < afsz) std::memset(dst + cnt, 0, (size_t)(afsz - cnt) * sizeof(float));
        af->pts = apos;
        apos += cnt;
        int rc = avcodec_send_frame(ac, af);
        av_frame_unref(af);
        if (rc < 0 || drain(ac, ast, afsz) < 0) { set_error("audio encode"); return -1; }
      } else {
        avcodec_send_frame(ac, nullptr);
        if (drain(ac, ast, afsz) < 0) { set_error("audio flush"); return -1; }
        a_done = true;
      }
    }
  }
  av_write_trailer(fmt);
  sws_freeContext(sws);
  av_frame_free(&vf);
  av_frame_free(&af);
  av_packet_free(&pkt);
  avcodec_free_context(&vc);
  avcodec_free_context(&ac);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
