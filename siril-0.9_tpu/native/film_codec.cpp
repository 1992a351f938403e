// Film codec bridge: H.264/VP9/... film decode and MP4/WEBM encode via
// the system libavformat/libavcodec, replacing the reference's two
// ffmpeg-backed subsystems with one native component:
//
//  - decode side = src/io/films.c (ffms2 film_open_file:66 /
//    film_read_frame:245): index the first video track, random access
//    by frame number, output gray8 or rgb24 exactly like the
//    reference's FFMS_SetOutputFormatV2 choice (plus a 16-bit path the
//    reference rejects: gray16/rgb48 sources keep their depth here).
//  - encode side = src/io/mp4_output.c (mp4_create:403 /
//    mp4_add_frame:495): container-guessed codec (mp4 -> H264,
//    webm -> VP9), yuv420p, gop_size 12, bit_rate (quality+1)*w*h/2,
//    tolerance 50000, optional resize through swscale.
//
// Compiled into libsirilfilm.so (separate from libsirilnative.so so the
// core native components never depend on ffmpeg's presence). All entry
// points are extern "C" for ctypes.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libavutil/pixdesc.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

void set_err(char *errbuf, int errlen, const std::string &msg) {
    if (errbuf && errlen > 0) {
        std::snprintf(errbuf, (size_t)errlen, "%s", msg.c_str());
    }
}

std::string av_errstr(int code) {
    char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
    av_strerror(code, buf, sizeof(buf));
    return std::string(buf);
}

// ------------------------------------------------------------------ decoder

struct Decoder {
    AVFormatContext *fmt = nullptr;
    AVCodecContext *ctx = nullptr;
    SwsContext *sws = nullptr;
    AVFrame *frame = nullptr;
    AVPacket *pkt = nullptr;
    int stream_index = -1;
    int width = 0, height = 0, nlayers = 1, bytes_per_sample = 1;
    double fps = 25.0;
    AVPixelFormat out_fmt = AV_PIX_FMT_GRAY8;
    std::vector<int64_t> pts;   // presentation timestamps, sorted
    int64_t next_index = 0;     // next presentation index the decode
                                // loop will produce (sequential reads
                                // skip the seek)
    bool need_seek = true;
    bool synthetic_ts = false;  // timestamps invented during indexing
    int sws_w = 0, sws_h = 0, sws_fmt = -1;

    ~Decoder() {
        if (sws) sws_freeContext(sws);
        if (frame) av_frame_free(&frame);
        if (pkt) av_packet_free(&pkt);
        if (ctx) avcodec_free_context(&ctx);
        if (fmt) avformat_close_input(&fmt);
    }
};

// Scan every packet of the video stream to build the frame index
// (pts list), the ffms2-indexing analog (films.c:66 comments).
int index_stream(Decoder *d, char *errbuf, int errlen) {
    AVPacket *pkt = av_packet_alloc();
    int64_t counter = 0;
    while (av_read_frame(d->fmt, pkt) >= 0) {
        if (pkt->stream_index == d->stream_index) {
            int64_t t = pkt->pts != AV_NOPTS_VALUE ? pkt->pts : pkt->dts;
            if (t == AV_NOPTS_VALUE) {
                t = counter;
                d->synthetic_ts = true;
            }
            d->pts.push_back(t);
            counter++;
        }
        av_packet_unref(pkt);
    }
    av_packet_free(&pkt);
    if (d->pts.empty()) {
        set_err(errbuf, errlen, "no video packets found");
        return -1;
    }
    // packets arrive in decode order; presentation order = sorted pts
    std::sort(d->pts.begin(), d->pts.end());
    return 0;
}

}  // namespace

extern "C" {

// Open a film; fills geometry/time info. Returns an opaque handle or
// NULL (message in errbuf). nlayers: 1 = gray, 3 = rgb. depth: bytes
// per sample of the output buffer (1 or 2).
void *fcodec_open(const char *path, int *w, int *h, int *nlayers,
                  int *nframes, double *fps, int *depth,
                  char *errbuf, int errlen) {
    av_log_set_level(AV_LOG_ERROR);
    Decoder *d = new Decoder();
    int ret = avformat_open_input(&d->fmt, path, nullptr, nullptr);
    if (ret < 0) {
        set_err(errbuf, errlen, "open: " + av_errstr(ret));
        delete d;
        return nullptr;
    }
    if ((ret = avformat_find_stream_info(d->fmt, nullptr)) < 0) {
        set_err(errbuf, errlen, "stream info: " + av_errstr(ret));
        delete d;
        return nullptr;
    }
    const AVCodec *codec = nullptr;
    ret = av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
    if (ret < 0 || !codec) {
        set_err(errbuf, errlen, "no decodable video stream");
        delete d;
        return nullptr;
    }
    d->stream_index = ret;
    AVStream *st = d->fmt->streams[d->stream_index];
    d->ctx = avcodec_alloc_context3(codec);
    avcodec_parameters_to_context(d->ctx, st->codecpar);
    d->ctx->thread_count = 0;  // auto
    if ((ret = avcodec_open2(d->ctx, codec, nullptr)) < 0) {
        set_err(errbuf, errlen, "decoder open: " + av_errstr(ret));
        delete d;
        return nullptr;
    }
    d->width = st->codecpar->width;
    d->height = st->codecpar->height;
    AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate
                                           : st->r_frame_rate;
    d->fps = fr.den ? (double)fr.num / fr.den : 25.0;

    // choose the output format the way films.c does (:169-186): luma-only
    // sources -> gray, everything else -> rgb; keep >8-bit depth instead
    // of rejecting it (reference prints "16-bit ... not supported yet").
    const AVPixFmtDescriptor *desc =
        av_pix_fmt_desc_get((AVPixelFormat)st->codecpar->format);
    int is_gray = desc && desc->nb_components == 1;
    int depth_bits = desc ? desc->comp[0].depth : 8;
    if (depth_bits > 8) {
        d->out_fmt = is_gray ? AV_PIX_FMT_GRAY16LE : AV_PIX_FMT_RGB48LE;
        d->bytes_per_sample = 2;
    } else {
        d->out_fmt = is_gray ? AV_PIX_FMT_GRAY8 : AV_PIX_FMT_RGB24;
        d->bytes_per_sample = 1;
    }
    d->nlayers = is_gray ? 1 : 3;

    if (index_stream(d, errbuf, errlen) < 0) {
        delete d;
        return nullptr;
    }
    // Some muxers clip the stream tail via edit lists (e.g. mp4s whose
    // packets carry zero durations — Siril 0.9's own exporter does
    // this, mp4_output.c): packets exist but the decoder discards the
    // final frame(s). Probe the last GOP once so nb_frames is the
    // DECODABLE count, matching ffms2's indexed guarantee.
    if (!d->synthetic_ts && !d->pts.empty()) {
        if (av_seek_frame(d->fmt, d->stream_index, d->pts.back(),
                          AVSEEK_FLAG_BACKWARD) >= 0) {
            avcodec_flush_buffers(d->ctx);
            AVPacket *pkt = av_packet_alloc();
            AVFrame *fr = av_frame_alloc();
            int64_t last_seen = INT64_MIN;
            bool draining = false;
            int guard = (int)d->pts.size() + 64;
            while (guard-- > 0) {
                int ret = avcodec_receive_frame(d->ctx, fr);
                if (ret == 0) {
                    int64_t t = fr->best_effort_timestamp;
                    if (t == AV_NOPTS_VALUE) t = fr->pts;
                    if (t != AV_NOPTS_VALUE && t > last_seen) last_seen = t;
                    av_frame_unref(fr);
                    continue;
                }
                if (ret == AVERROR(EAGAIN)) {
                    if (draining) break;
                    ret = av_read_frame(d->fmt, pkt);
                    if (ret < 0) {
                        avcodec_send_packet(d->ctx, nullptr);
                        draining = true;
                        continue;
                    }
                    if (pkt->stream_index == d->stream_index)
                        avcodec_send_packet(d->ctx, pkt);
                    av_packet_unref(pkt);
                    continue;
                }
                break;  // AVERROR_EOF or error: probe done
            }
            av_packet_free(&pkt);
            av_frame_free(&fr);
            if (last_seen != INT64_MIN) {
                while (!d->pts.empty() && d->pts.back() > last_seen)
                    d->pts.pop_back();
            }
            avcodec_flush_buffers(d->ctx);
        }
        if (d->pts.empty()) {
            set_err(errbuf, errlen, "no decodable frames");
            delete d;
            return nullptr;
        }
    }
    // rewind for the first sequential read
    av_seek_frame(d->fmt, d->stream_index, d->pts.front(),
                  AVSEEK_FLAG_BACKWARD);
    d->frame = av_frame_alloc();
    d->pkt = av_packet_alloc();
    d->need_seek = false;
    d->next_index = 0;

    *w = d->width;
    *h = d->height;
    *nlayers = d->nlayers;
    *nframes = (int)d->pts.size();
    *fps = d->fps;
    *depth = d->bytes_per_sample;
    return d;
}

// Read presentation frame `index` into out (packed gray8/rgb24 or
// gray16le/rgb48le, top-down, width*height*nlayers samples). Random
// access seeks to the nearest prior keyframe like ffms2.
int fcodec_read(void *handle, int index, uint8_t *out,
                char *errbuf, int errlen) {
    Decoder *d = (Decoder *)handle;
    if (index < 0 || index >= (int)d->pts.size()) {
        set_err(errbuf, errlen, "frame index out of range");
        return -1;
    }
    int64_t target = d->pts[(size_t)index];
    if (d->need_seek || index != d->next_index) {
        if (d->synthetic_ts) {
            // timestampless stream: timestamps are fabricated counters,
            // so demuxer seeks are meaningless — rewind and decode
            // forward counting frames (every produced frame advances
            // next_index; the loop below returns at index)
            if (index >= d->next_index && !d->need_seek) {
                // forward skip: just keep decoding from where we are
            } else {
                avio_seek(d->fmt->pb, 0, SEEK_SET);
                avformat_seek_file(d->fmt, d->stream_index, INT64_MIN, 0,
                                   INT64_MAX, AVSEEK_FLAG_BYTE);
                avcodec_flush_buffers(d->ctx);
                d->next_index = 0;
            }
        } else {
            int ret = av_seek_frame(d->fmt, d->stream_index, target,
                                    AVSEEK_FLAG_BACKWARD);
            if (ret < 0) {  // fall back: rewind to the start
                avio_seek(d->fmt->pb, 0, SEEK_SET);
                avformat_seek_file(d->fmt, d->stream_index, INT64_MIN,
                                   d->pts.front(), d->pts.front(), 0);
            }
            avcodec_flush_buffers(d->ctx);
        }
        d->need_seek = false;
    }

    bool draining = false;
    int guard = (int)d->pts.size() + 64;
    while (guard-- > 0) {
        int ret = avcodec_receive_frame(d->ctx, d->frame);
        if (ret == 0) {
            int64_t t = d->frame->best_effort_timestamp;
            if (t == AV_NOPTS_VALUE) t = d->frame->pts;
            bool hit;
            if (d->synthetic_ts || t == AV_NOPTS_VALUE) {
                // timestampless stream: frames are identified by COUNT
                // from the rewind point (next_index), not timestamps
                hit = d->next_index == index;
                if (!hit) d->next_index++;
            } else {
                hit = t >= target;
            }
            if (!hit) {
                av_frame_unref(d->frame);
                continue;
            }
            // convert to the requested packed output; resolution and
            // colorspace are per-frame properties (films.c:139-141
            // comment) — rebuild the scaler if the stream changed
            if (!d->sws || d->frame->width != d->sws_w ||
                d->frame->height != d->sws_h ||
                d->frame->format != d->sws_fmt) {
                if (d->sws) sws_freeContext(d->sws);
                d->sws = sws_getContext(
                    d->frame->width, d->frame->height,
                    (AVPixelFormat)d->frame->format, d->width, d->height,
                    d->out_fmt, SWS_BICUBIC, nullptr, nullptr, nullptr);
                d->sws_w = d->frame->width;
                d->sws_h = d->frame->height;
                d->sws_fmt = d->frame->format;
            }
            uint8_t *dst[4] = {out, nullptr, nullptr, nullptr};
            int dst_ls[4] = {
                d->width * d->nlayers * d->bytes_per_sample, 0, 0, 0};
            sws_scale(d->sws, d->frame->data, d->frame->linesize, 0,
                      d->frame->height, dst, dst_ls);
            av_frame_unref(d->frame);
            // locate where we are in presentation order for the
            // sequential-read fast path
            if (d->synthetic_ts || t == AV_NOPTS_VALUE) {
                d->next_index = index + 1;   // counted stream
            } else {
                auto it = std::upper_bound(d->pts.begin(), d->pts.end(), t);
                d->next_index = (int64_t)(it - d->pts.begin());
            }
            return 0;
        }
        if (ret == AVERROR(EAGAIN)) {
            if (draining) {
                set_err(errbuf, errlen, "decoder drained without frame");
                return -1;
            }
            ret = av_read_frame(d->fmt, d->pkt);
            if (ret < 0) {
                avcodec_send_packet(d->ctx, nullptr);  // EOF: drain
                draining = true;
                continue;
            }
            if (d->pkt->stream_index == d->stream_index) {
                avcodec_send_packet(d->ctx, d->pkt);
            }
            av_packet_unref(d->pkt);
            continue;
        }
        if (ret == AVERROR_EOF) {
            set_err(errbuf, errlen, "EOF before target frame");
            d->need_seek = true;
            return -1;
        }
        set_err(errbuf, errlen, "decode: " + av_errstr(ret));
        d->need_seek = true;
        return -1;
    }
    set_err(errbuf, errlen, "decode loop guard tripped");
    return -1;
}

void fcodec_close(void *handle) { delete (Decoder *)handle; }

// ------------------------------------------------------------------ encoder

struct Encoder {
    AVFormatContext *oc = nullptr;
    AVCodecContext *ctx = nullptr;
    AVStream *st = nullptr;
    SwsContext *sws = nullptr;
    AVFrame *frame = nullptr;      // yuv420p encode frame
    AVFrame *tmp = nullptr;        // gray8/rgb24 input frame
    AVPacket *pkt = nullptr;
    int src_w = 0, src_h = 0, nlayers = 1;
    int64_t next_pts = 0;
    bool header_written = false;

    ~Encoder() {
        if (sws) sws_freeContext(sws);
        if (frame) av_frame_free(&frame);
        if (tmp) av_frame_free(&tmp);
        if (pkt) av_packet_free(&pkt);
        if (ctx) avcodec_free_context(&ctx);
        if (oc) {
            if (!(oc->oformat->flags & AVFMT_NOFILE) && oc->pb)
                avio_closep(&oc->pb);
            avformat_free_context(oc);
        }
    }
};

namespace {

int drain_packets(Encoder *e, char *errbuf, int errlen) {
    while (true) {
        int ret = avcodec_receive_packet(e->ctx, e->pkt);
        if (ret == AVERROR(EAGAIN) || ret == AVERROR_EOF) return 0;
        if (ret < 0) {
            set_err(errbuf, errlen, "encode: " + av_errstr(ret));
            return -1;
        }
        // without explicit durations the mp4 muxer mis-sizes the edit
        // list and the decoder discards the final frame of every file
        if (e->pkt->duration == 0) e->pkt->duration = 1;
        av_packet_rescale_ts(e->pkt, e->ctx->time_base, e->st->time_base);
        e->pkt->stream_index = e->st->index;
        ret = av_interleaved_write_frame(e->oc, e->pkt);
        if (ret < 0) {
            set_err(errbuf, errlen, "mux: " + av_errstr(ret));
            return -1;
        }
    }
}

}  // namespace

// Create an MP4/WEBM (or any libavformat-guessed container) encoder.
// Mirrors mp4_create (mp4_output.c:403-493): codec from the container,
// yuv420p, gop 12, bitrate (quality+1)*dst_w*dst_h/2. Input frames are
// packed top-down gray8 (nlayers 1) or rgb24 (nlayers 3) at src_w x
// src_h, resized on the fly when dst differs (export crop/resize knob,
// sequence.c:1132-1146).
void *fcodec_enc_open(const char *path, int dst_w, int dst_h, double fps,
                      int nlayers, int quality, int src_w, int src_h,
                      char *errbuf, int errlen) {
    av_log_set_level(AV_LOG_ERROR);
    if (dst_w % 2 || dst_h % 2 || fps <= 0 || quality < 1 || quality > 5) {
        set_err(errbuf, errlen,
                "dimensions must be even, fps > 0, quality in 1..5");
        return nullptr;
    }
    Encoder *e = new Encoder();
    int ret = avformat_alloc_output_context2(&e->oc, nullptr, nullptr, path);
    if (ret < 0 || !e->oc) {
        set_err(errbuf, errlen, "container: " + av_errstr(ret));
        delete e;
        return nullptr;
    }
    AVCodecID cid = e->oc->oformat->video_codec;  // mp4->H264, webm->VP9
    const AVCodec *codec = avcodec_find_encoder(cid);
    if (!codec) {
        set_err(errbuf, errlen, std::string("no encoder for ") +
                                    avcodec_get_name(cid));
        delete e;
        return nullptr;
    }
    e->st = avformat_new_stream(e->oc, nullptr);
    e->ctx = avcodec_alloc_context3(codec);
    e->ctx->codec_id = cid;
    e->ctx->width = dst_w;
    e->ctx->height = dst_h;
    e->ctx->time_base = av_d2q(1.0 / fps, 100000);
    e->st->time_base = e->ctx->time_base;
    e->ctx->gop_size = 12;
    e->ctx->pix_fmt = AV_PIX_FMT_YUV420P;
    e->ctx->bit_rate = (int64_t)(quality + 1) * dst_w * dst_h / 2;
    e->ctx->bit_rate_tolerance = 50000;
    if (e->ctx->bit_rate_tolerance < e->ctx->bit_rate / 4)
        e->ctx->bit_rate_tolerance = (int)(e->ctx->bit_rate / 4);
    if (e->oc->oformat->flags & AVFMT_GLOBALHEADER)
        e->ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (cid == AV_CODEC_ID_VP9) {
        // libvpx's default "good quality, cpu-used 0" is far too slow
        // for sequence export; these keep VP9 real-time-ish
        av_opt_set(e->ctx->priv_data, "deadline", "realtime", 0);
        av_opt_set(e->ctx->priv_data, "cpu-used", "8", 0);
        av_opt_set(e->ctx->priv_data, "row-mt", "1", 0);
    }
    if ((ret = avcodec_open2(e->ctx, codec, nullptr)) < 0) {
        set_err(errbuf, errlen, "encoder open: " + av_errstr(ret));
        delete e;
        return nullptr;
    }
    avcodec_parameters_from_context(e->st->codecpar, e->ctx);

    e->frame = av_frame_alloc();
    e->frame->format = AV_PIX_FMT_YUV420P;
    e->frame->width = dst_w;
    e->frame->height = dst_h;
    if (av_frame_get_buffer(e->frame, 0) < 0) {
        set_err(errbuf, errlen, "frame alloc failed");
        delete e;
        return nullptr;
    }
    e->src_w = src_w > 0 ? src_w : dst_w;
    e->src_h = src_h > 0 ? src_h : dst_h;
    e->nlayers = nlayers == 1 ? 1 : 3;
    AVPixelFormat src_fmt =
        e->nlayers == 1 ? AV_PIX_FMT_GRAY8 : AV_PIX_FMT_RGB24;
    e->sws = sws_getContext(e->src_w, e->src_h, src_fmt, dst_w, dst_h,
                            AV_PIX_FMT_YUV420P, SWS_BICUBIC, nullptr,
                            nullptr, nullptr);
    e->pkt = av_packet_alloc();

    if (!(e->oc->oformat->flags & AVFMT_NOFILE)) {
        if ((ret = avio_open(&e->oc->pb, path, AVIO_FLAG_WRITE)) < 0) {
            set_err(errbuf, errlen, "file open: " + av_errstr(ret));
            delete e;
            return nullptr;
        }
    }
    if ((ret = avformat_write_header(e->oc, nullptr)) < 0) {
        set_err(errbuf, errlen, "header: " + av_errstr(ret));
        delete e;
        return nullptr;
    }
    e->header_written = true;
    return e;
}

// data: packed top-down gray8 or rgb24, src_w*src_h*nlayers bytes.
int fcodec_enc_add(void *handle, const uint8_t *data,
                   char *errbuf, int errlen) {
    Encoder *e = (Encoder *)handle;
    const uint8_t *src[4] = {data, nullptr, nullptr, nullptr};
    int src_ls[4] = {e->src_w * e->nlayers, 0, 0, 0};
    if (av_frame_make_writable(e->frame) < 0) {
        set_err(errbuf, errlen, "frame not writable");
        return -1;
    }
    sws_scale(e->sws, src, src_ls, 0, e->src_h, e->frame->data,
              e->frame->linesize);
    // packet durations are stamped in drain_packets (AVFrame's duration
    // field was renamed between ffmpeg 5 and 6, so it is avoided here)
    e->frame->pts = e->next_pts++;
    int ret = avcodec_send_frame(e->ctx, e->frame);
    if (ret < 0) {
        set_err(errbuf, errlen, "send frame: " + av_errstr(ret));
        return -1;
    }
    return drain_packets(e, errbuf, errlen);
}

int fcodec_enc_close(void *handle, char *errbuf, int errlen) {
    Encoder *e = (Encoder *)handle;
    int rc = 0;
    if (e->header_written) {
        avcodec_send_frame(e->ctx, nullptr);  // flush
        rc = drain_packets(e, errbuf, errlen);
        int ret = av_write_trailer(e->oc);
        if (ret < 0 && rc == 0) {
            set_err(errbuf, errlen, "trailer: " + av_errstr(ret));
            rc = -1;
        }
    }
    delete e;
    return rc;
}

}  // extern "C"

// ---------------------------------------------------------------------
// Independent lossless-JPEG (SOF3) decode through libavcodec's mjpeg
// decoder — a THIRD-PARTY anchor for the in-repo LJ92 machinery
// (native/lj92.cpp + the Python test encoder), breaking the
// encoder/decoder circularity for the lossless-JPEG raw family
// (DNG/CR2; see PARITY.md raw-provenance note). Test-only surface.

extern "C" {

// Decode a complete SOI..EOI lossless-JPEG stream. Returns 0 and fills
// out (row-major u16), w, h, on success; negative on failure.
// out_cap = capacity of out in u16 samples. Grayscale (1-component)
// streams only: ffmpeg maps them to GRAY16LE.
int lj92_av_decode(const uint8_t *buf, int len, uint16_t *out,
                   long out_cap, int *w, int *h) {
    const AVCodec *codec = avcodec_find_decoder(AV_CODEC_ID_MJPEG);
    if (!codec) return -1;
    AVCodecContext *ctx = avcodec_alloc_context3(codec);
    if (!ctx) return -2;
    if (avcodec_open2(ctx, codec, nullptr) < 0) {
        avcodec_free_context(&ctx);
        return -3;
    }
    AVPacket *pkt = av_packet_alloc();
    AVFrame *fr = av_frame_alloc();
    int ret = -4;
    if (pkt && fr && av_new_packet(pkt, len) == 0) {
        memcpy(pkt->data, buf, len);
        int rc = avcodec_send_packet(ctx, pkt);
        if (rc >= 0) rc = avcodec_receive_frame(ctx, fr);
        if (rc >= 0) {
            *w = fr->width;
            *h = fr->height;
            if (fr->format == AV_PIX_FMT_GRAY16LE) {
                if ((long)fr->width * fr->height <= out_cap) {
                    for (int y = 0; y < fr->height; y++)
                        memcpy(out + (long)y * fr->width,
                               fr->data[0] + (long)y * fr->linesize[0],
                               (size_t)fr->width * 2);
                    ret = 0;
                } else {
                    ret = -5;
                }
            } else {
                ret = -(100 + fr->format);  // unexpected pix fmt
            }
        }
    }
    if (fr) av_frame_free(&fr);
    if (pkt) av_packet_free(&pkt);
    avcodec_free_context(&ctx);
    return ret;
}

}  // extern "C"
