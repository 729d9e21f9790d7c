// Host-side media ingest runtime for deepfly3d_tpu.
//
// The reference pipeline's ingest is torch's C++ DataLoader (pinned-memory
// staging + worker processes, reference df3d/cli.py:146-150) plus ffmpeg
// subprocesses that expand videos to JPEG files on disk (reference
// df3d/core.py:446-459).  This runtime replaces both:
//
//  * df3d_decode_jpeg_batch — multithreaded libjpeg decode of a batch of
//    files straight into one caller-owned contiguous uint8 buffer (ready
//    for a single jax.device_put H2D transfer).
//  * df3d_video_open/read/close — in-process libavformat/libavcodec/
//    libswscale streaming decode of camera_X.mp4 directly to RGB frames:
//    no subprocess spawn, no intermediate JPEGs on disk.
//
// C ABI only — bound from Python via ctypes (no pybind11 in the image).

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libswscale/swscale.h>
}

namespace {

// ---------------------------------------------------------------- libjpeg

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file into `out` (expected h*w*3, RGB). Returns 0 on
// success, nonzero on failure (wrong size counts as failure).
int decode_one_jpeg(const char* path, uint8_t* out, int expect_h, int expect_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  if ((int)cinfo.output_height != expect_h ||
      (int)cinfo.output_width != expect_w ||
      cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return 3;
  }
  const int stride = expect_w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return 0;
}

}  // namespace

extern "C" {

// Decode `n` JPEG files (all h x w x 3) into `out` (n*h*w*3 bytes) using
// `num_threads` workers. Returns the number of failed decodes.
int df3d_decode_jpeg_batch(const char** paths, int n, uint8_t* out, int h,
                           int w, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::atomic<int> next(0), failures(0);
  const size_t frame_bytes = (size_t)h * w * 3;

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      if (decode_one_jpeg(paths[i], out + (size_t)i * frame_bytes, h, w) != 0)
        failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

// ------------------------------------------------------------------ libav

struct VideoStream {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;
  int width = 0, height = 0;
  double fps = 0.0;
};

// Open a video for streaming decode. Returns an opaque handle or nullptr.
void* df3d_video_open(const char* path) {
  auto* v = new VideoStream();
  if (avformat_open_input(&v->fmt, path, nullptr, nullptr) < 0) {
    delete v;
    return nullptr;
  }
  if (avformat_find_stream_info(v->fmt, nullptr) < 0) goto fail;
  for (unsigned i = 0; i < v->fmt->nb_streams; ++i) {
    if (v->fmt->streams[i]->codecpar->codec_type == AVMEDIA_TYPE_VIDEO) {
      v->stream_index = (int)i;
      break;
    }
  }
  if (v->stream_index < 0) goto fail;
  {
    AVStream* st = v->fmt->streams[v->stream_index];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) goto fail;
    v->codec = avcodec_alloc_context3(dec);
    if (avcodec_parameters_to_context(v->codec, st->codecpar) < 0) goto fail;
    if (avcodec_open2(v->codec, dec, nullptr) < 0) goto fail;
    v->width = v->codec->width;
    v->height = v->codec->height;
    AVRational r = st->avg_frame_rate;
    v->fps = r.den ? (double)r.num / r.den : 0.0;
    v->frame = av_frame_alloc();
    v->pkt = av_packet_alloc();
  }
  return v;
fail:
  if (v->codec) avcodec_free_context(&v->codec);
  if (v->fmt) avformat_close_input(&v->fmt);
  delete v;
  return nullptr;
}

int df3d_video_width(void* handle) { return ((VideoStream*)handle)->width; }
int df3d_video_height(void* handle) { return ((VideoStream*)handle)->height; }
double df3d_video_fps(void* handle) { return ((VideoStream*)handle)->fps; }

// Decode the next frame into `out` (height*width*3 RGB). Returns 1 on a
// frame, 0 on EOF, negative on error.
int df3d_video_read(void* handle, uint8_t* out) {
  auto* v = (VideoStream*)handle;
  while (true) {
    int ret = avcodec_receive_frame(v->codec, v->frame);
    if (ret == 0) break;
    if (ret == AVERROR_EOF) return 0;
    if (ret != AVERROR(EAGAIN)) return -1;
    // feed another packet
    ret = av_read_frame(v->fmt, v->pkt);
    if (ret < 0) {
      avcodec_send_packet(v->codec, nullptr);  // flush
      continue;
    }
    if (v->pkt->stream_index == v->stream_index)
      avcodec_send_packet(v->codec, v->pkt);
    av_packet_unref(v->pkt);
  }
  if (!v->sws) {
    v->sws = sws_getContext(v->width, v->height, (AVPixelFormat)v->frame->format,
                            v->width, v->height, AV_PIX_FMT_RGB24,
                            SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!v->sws) return -2;
  }
  uint8_t* dst[1] = {out};
  int dst_stride[1] = {v->width * 3};
  sws_scale(v->sws, v->frame->data, v->frame->linesize, 0, v->height, dst,
            dst_stride);
  av_frame_unref(v->frame);
  return 1;
}

void df3d_video_close(void* handle) {
  auto* v = (VideoStream*)handle;
  if (v->sws) sws_freeContext(v->sws);
  if (v->frame) av_frame_free(&v->frame);
  if (v->pkt) av_packet_free(&v->pkt);
  if (v->codec) avcodec_free_context(&v->codec);
  if (v->fmt) avformat_close_input(&v->fmt);
  delete v;
}

}  // extern "C"
