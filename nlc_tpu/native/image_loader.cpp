// Native data-loader: multithreaded JPEG/PNG decode + center/random crop +
// normalize, exposed to Python via a C ABI (ctypes).
//
// The input pipeline is the one genuinely host-bound stage of the framework
// (decode + crop + float conversion per image); this runs it on a worker
// thread pool off the Python GIL, feeding NHWC float32 [-1, 1] batches.
// The Python wrapper (nlc_tpu/native/__init__.py) compiles this on first use
// and falls back to PIL when a toolchain or libs are unavailable.
//
// Build: g++ -O3 -shared -fPIC image_loader.cpp -o libnlcloader.so -lpng -ljpeg -lpthread

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <atomic>
#include <thread>
#include <vector>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>

namespace {

struct Image {
    std::vector<uint8_t> data;  // RGB8
    int w = 0, h = 0;
    bool ok = false;
};

bool has_suffix(const char* path, const char* a, const char* b = nullptr) {
    size_t n = strlen(path);
    auto ends = [&](const char* s) {
        size_t m = strlen(s);
        if (n < m) return false;
        for (size_t i = 0; i < m; i++) {
            char c = path[n - m + i];
            if (c >= 'A' && c <= 'Z') c += 32;
            if (c != s[i]) return false;
        }
        return true;
    };
    return ends(a) || (b && ends(b));
}

Image decode_png(const char* path) {
    Image img;
    FILE* fp = fopen(path, "rb");
    if (!fp) return img;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return img;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    png_uint_32 w, h;
    int bit_depth, color_type;
    png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
                 nullptr);
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color_type == PNG_COLOR_TYPE_GRAY ||
        color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    img.w = (int)w;
    img.h = (int)h;
    img.data.resize((size_t)w * h * 3);
    std::vector<png_bytep> rows(h);
    for (png_uint_32 y = 0; y < h; y++)
        rows[y] = img.data.data() + (size_t)y * w * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    img.ok = true;
    return img;
}

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = (JpegErr*)cinfo->err;
    longjmp(err->jb, 1);
}

Image decode_jpeg(const char* path) {
    Image img;
    FILE* fp = fopen(path, "rb");
    if (!fp) return img;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(fp);
        return img;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    img.w = cinfo.output_width;
    img.h = cinfo.output_height;
    img.data.resize((size_t)img.w * img.h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = img.data.data() + (size_t)cinfo.output_scanline * img.w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    img.ok = true;
    return img;
}

// splitmix64 finalizer: per-item seeds arrive as consecutive integers
// (seed+i); a single LCG scramble leaves adjacent streams affinely related,
// so finalize before any draws to decorrelate them
static inline uint64_t mix_seed(uint64_t z) {
    z += 0x9e3779b97f4a7c15ULL;
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

// box-downsample by integer factor then bilinear-resize shortest side to
// `resolution`, crop to resolution x resolution
void process_one(const char* path, int resolution, int random_crop,
                 uint64_t seed, float* out, int* ok_flag) {
    Image img = has_suffix(path, ".png") ? decode_png(path)
                : has_suffix(path, ".jpg", ".jpeg") ? decode_jpeg(path)
                : Image{};
    if (!img.ok || img.w < 1 || img.h < 1) {
        *ok_flag = 0;
        memset(out, 0, sizeof(float) * (size_t)resolution * resolution * 3);
        return;
    }
    // bilinear resize so min side == resolution
    double scale = (double)resolution / (img.w < img.h ? img.w : img.h);
    int nw = (int)(img.w * scale + 0.5);
    int nh = (int)(img.h * scale + 0.5);
    if (nw < resolution) nw = resolution;
    if (nh < resolution) nh = resolution;
    std::vector<float> resized((size_t)nw * nh * 3);
    for (int y = 0; y < nh; y++) {
        double sy = (y + 0.5) / scale - 0.5;
        int y0 = (int)sy;
        if (y0 < 0) y0 = 0;
        int y1 = y0 + 1 < img.h ? y0 + 1 : img.h - 1;
        double fy = sy - y0;
        if (fy < 0) fy = 0;
        for (int x = 0; x < nw; x++) {
            double sx = (x + 0.5) / scale - 0.5;
            int x0 = (int)sx;
            if (x0 < 0) x0 = 0;
            int x1 = x0 + 1 < img.w ? x0 + 1 : img.w - 1;
            double fx = sx - x0;
            if (fx < 0) fx = 0;
            for (int ch = 0; ch < 3; ch++) {
                double v00 = img.data[((size_t)y0 * img.w + x0) * 3 + ch];
                double v01 = img.data[((size_t)y0 * img.w + x1) * 3 + ch];
                double v10 = img.data[((size_t)y1 * img.w + x0) * 3 + ch];
                double v11 = img.data[((size_t)y1 * img.w + x1) * 3 + ch];
                double v = v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
                           v10 * fy * (1 - fx) + v11 * fy * fx;
                resized[((size_t)y * nw + x) * 3 + ch] = (float)v;
            }
        }
    }
    // crop
    uint64_t rng = mix_seed(seed);
    int max_top = nh - resolution, max_left = nw - resolution;
    int top, left;
    if (random_crop) {
        rng = rng * 6364136223846793005ULL + 1442695040888963407ULL;
        top = max_top > 0 ? (int)(rng % (uint64_t)(max_top + 1)) : 0;
        rng = rng * 6364136223846793005ULL + 1442695040888963407ULL;
        left = max_left > 0 ? (int)(rng % (uint64_t)(max_left + 1)) : 0;
    } else {
        top = max_top / 2;
        left = max_left / 2;
    }
    for (int y = 0; y < resolution; y++) {
        const float* src = resized.data() + ((size_t)(y + top) * nw + left) * 3;
        float* dst = out + (size_t)y * resolution * 3;
        for (int i = 0; i < resolution * 3; i++)
            dst[i] = src[i] / 127.5f - 1.0f;
    }
    *ok_flag = 1;
}

// Paired restoration loading (reference basicsr/data/paired_image_dataset.py
// semantics): decode lq+gt at NATIVE scale — no resize, the lq/gt degradation
// relationship must survive — take a paired random crop (lq_patch at
// (top,left) in lq coords, gt crop of lq_patch*scale at the scaled offset),
// and apply the same flip/rot draw to both. Output float32 [0,1] (the
// restoration convention, vs [-1,1] for the diffusion loader above).
void process_pair(const char* lq_path, const char* gt_path, int lq_patch,
                  int scale, int use_flip, int use_rot, int emit_u8,
                  uint64_t seed, void* lq_out, void* gt_out, int* ok_flag) {
    auto dec = [](const char* p) {
        return has_suffix(p, ".png") ? decode_png(p)
               : has_suffix(p, ".jpg", ".jpeg") ? decode_jpeg(p) : Image{};
    };
    Image lq = dec(lq_path), gt = dec(gt_path);
    int gt_patch = lq_patch * scale;
    size_t lq_px = (size_t)lq_patch * lq_patch * 3;
    size_t gt_px = (size_t)gt_patch * gt_patch * 3;
    size_t elt = emit_u8 ? sizeof(uint8_t) : sizeof(float);
    if (!lq.ok || !gt.ok || lq.w < lq_patch || lq.h < lq_patch ||
        gt.w < lq.w * scale || gt.h < lq.h * scale) {
        *ok_flag = 0;
        memset(lq_out, 0, elt * lq_px);
        memset(gt_out, 0, elt * gt_px);
        return;
    }
    uint64_t rng = mix_seed(seed);
    auto draw = [&rng](uint64_t m) {
        rng = rng * 6364136223846793005ULL + 1442695040888963407ULL;
        return (int)((rng >> 33) % m);
    };
    int top = draw((uint64_t)(lq.h - lq_patch + 1));
    int left = draw((uint64_t)(lq.w - lq_patch + 1));
    int hflip = use_flip ? draw(2) : 0;
    int vflip = use_rot ? draw(2) : 0;
    int transp = use_rot ? draw(2) : 0;
    // out(y,x) after [hflip, vflip, transpose] applied in sequence reads
    // source (a,b): (a,b) = transp ? (x,y) : (y,x); vflip: a = P-1-a;
    // hflip: b = P-1-b  (matches restoration/data.py paired_augment)
    // typed emit loops: writing through void* per pixel defeats
    // vectorization (measured 10x on the float path) — resolve the dtype
    // once and keep the inner loops on typed pointers with row fast paths
    bool ident = !hflip && !vflip && !transp;
    auto src_at = [&](const Image& img, int t0, int l0, int patch,
                      int y, int x) -> const uint8_t* {
        int a = transp ? x : y, b = transp ? y : x;
        if (vflip) a = patch - 1 - a;
        if (hflip) b = patch - 1 - b;
        return &img.data[(((size_t)(t0 + a) * img.w) + l0 + b) * 3];
    };
    auto emit_u8_fn = [&](const Image& img, int t0, int l0, int patch,
                          uint8_t* out) {
        for (int y = 0; y < patch; y++) {
            if (ident) {
                memcpy(out + (size_t)y * patch * 3,
                       &img.data[(((size_t)(t0 + y) * img.w) + l0) * 3],
                       (size_t)patch * 3);
                continue;
            }
            for (int x = 0; x < patch; x++) {
                const uint8_t* s = src_at(img, t0, l0, patch, y, x);
                uint8_t* d = out + ((size_t)y * patch + x) * 3;
                d[0] = s[0]; d[1] = s[1]; d[2] = s[2];
            }
        }
    };
    auto emit_f32 = [&](const Image& img, int t0, int l0, int patch,
                        float* out) {
        const float inv = 1.0f / 255.0f;
        for (int y = 0; y < patch; y++) {
            if (ident) {
                const uint8_t* s =
                    &img.data[(((size_t)(t0 + y) * img.w) + l0) * 3];
                float* d = out + (size_t)y * patch * 3;
                for (int i = 0; i < patch * 3; i++) d[i] = s[i] * inv;
                continue;
            }
            for (int x = 0; x < patch; x++) {
                const uint8_t* s = src_at(img, t0, l0, patch, y, x);
                float* d = out + ((size_t)y * patch + x) * 3;
                d[0] = s[0] * inv; d[1] = s[1] * inv; d[2] = s[2] * inv;
            }
        }
    };
    if (emit_u8) {
        emit_u8_fn(lq, top, left, lq_patch, (uint8_t*)lq_out);
        emit_u8_fn(gt, top * scale, left * scale, gt_patch, (uint8_t*)gt_out);
    } else {
        emit_f32(lq, top, left, lq_patch, (float*)lq_out);
        emit_f32(gt, top * scale, left * scale, gt_patch, (float*)gt_out);
    }
    *ok_flag = 1;
}

}  // namespace

extern "C" {

// Decode + crop + normalize a batch of images into out (N, res, res, 3)
// float32 NHWC in [-1, 1], using `num_threads` workers. ok_flags: per-image
// success. Returns number of successfully decoded images.
int nlc_load_batch(const char** paths, int n, int resolution, int random_crop,
                   uint64_t seed, int num_threads, float* out, int* ok_flags) {
    if (num_threads < 1) num_threads = 1;
    std::atomic<int> next(0);
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            process_one(paths[i], resolution, random_crop, seed + (uint64_t)i,
                        out + (size_t)i * resolution * resolution * 3,
                        ok_flags + i);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads - 1; t++) threads.emplace_back(worker);
    worker();
    for (auto& th : threads) th.join();
    int ok = 0;
    for (int i = 0; i < n; i++) ok += ok_flags[i];
    return ok;
}

// Paired batch: fills lq_out (N, P, P, 3) and gt_out (N, P*scale, P*scale, 3)
// float32 [0,1]. Returns number of successfully loaded pairs.
int nlc_load_paired_batch(const char** lq_paths, const char** gt_paths, int n,
                          int lq_patch, int scale, int use_flip, int use_rot,
                          int emit_u8, uint64_t seed, int num_threads,
                          void* lq_out, void* gt_out, int* ok_flags) {
    if (num_threads < 1) num_threads = 1;
    int gt_patch = lq_patch * scale;
    size_t elt = emit_u8 ? sizeof(uint8_t) : sizeof(float);
    std::atomic<int> next(0);
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            process_pair(lq_paths[i], gt_paths[i], lq_patch, scale, use_flip,
                         use_rot, emit_u8, seed + (uint64_t)i,
                         (uint8_t*)lq_out + elt * i * lq_patch * lq_patch * 3,
                         (uint8_t*)gt_out + elt * i * gt_patch * gt_patch * 3,
                         ok_flags + i);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads - 1; t++) threads.emplace_back(worker);
    worker();
    for (auto& th : threads) th.join();
    int ok = 0;
    for (int i = 0; i < n; i++) ok += ok_flags[i];
    return ok;
}

// Encode a batch of (N, H, W, 3) uint8 images to PNG files in parallel.
// Returns the number successfully written.
int nlc_save_batch(const uint8_t* data, int n, int h, int w,
                   const char** paths, int num_threads) {
    if (num_threads < 1) num_threads = 1;
    std::atomic<int> next(0);
    std::atomic<int> ok(0);
    auto worker = [&]() {
        while (true) {
            int i = next.fetch_add(1);
            if (i >= n) break;
            FILE* fp = fopen(paths[i], "wb");
            if (!fp) continue;
            png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                                      nullptr, nullptr, nullptr);
            png_infop info = png_create_info_struct(png);
            if (setjmp(png_jmpbuf(png))) {
                png_destroy_write_struct(&png, &info);
                fclose(fp);
                continue;
            }
            png_init_io(png, fp);
            // speed over ratio: eval dumps are throughput-bound; level 1 +
            // no filtering is ~4x faster than the zlib-6 default and the
            // pixels are identical on readback
            png_set_compression_level(png, 1);
            png_set_filter(png, 0, PNG_FILTER_NONE);
            png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB,
                         PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                         PNG_FILTER_TYPE_DEFAULT);
            png_write_info(png, info);
            const uint8_t* base = data + (size_t)i * h * w * 3;
            for (int y = 0; y < h; y++)
                png_write_row(png, const_cast<png_bytep>(
                    base + (size_t)y * w * 3));
            png_write_end(png, nullptr);
            png_destroy_write_struct(&png, &info);
            fclose(fp);
            ok.fetch_add(1);
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads - 1; t++) threads.emplace_back(worker);
    worker();
    for (auto& th : threads) th.join();
    return ok.load();
}

}  // extern "C"
