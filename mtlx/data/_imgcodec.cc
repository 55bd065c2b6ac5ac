/* Native image codec for the host data pipeline — fused JPEG decode +
 * bilinear resize (CPython extension, C++, libjpeg).
 *
 * This is the data-loader's native runtime component: the reference's
 * input path ran tf.image.decode_jpeg/resize inside TF's C++ kernels
 * with queue-runner threads (SURVEY.md §3.12); here the equivalent is a
 * GIL-releasing decode+resize with a std::thread pool for batches, so a
 * production host's loader workers scale across cores. For downscales
 * the decode itself runs at the nearest DCT scale (libjpeg scale_num/8)
 * before the exact bilinear pass — decoding 1/2 or 1/4 resolution is
 * nearly free.
 *
 * mtlx/data/loader.py uses this when built (tools/build_native.py) and
 * falls back to PIL otherwise; outputs are validated against the PIL
 * path in tests/test_imgcodec.py.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <csetjmp>
#include <cstring>
#include <atomic>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct ErrMgr {
    jpeg_error_mgr pub;
    jmp_buf jb;
    char msg[JMSG_LENGTH_MAX];
};

void err_exit(j_common_ptr cinfo) {
    ErrMgr* e = reinterpret_cast<ErrMgr*>(cinfo->err);
    (*cinfo->err->format_message)(cinfo, e->msg);
    longjmp(e->jb, 1);
}

// bilinear, RGB interleaved uint8. legacy=0: half-pixel centers (TF2 /
// jax convention); legacy=1: src = dst * scale (TF1 resize_images
// align_corners=False — the reference's in-graph resize).
void resize_bilinear(const unsigned char* src, int sh, int sw,
                     unsigned char* dst, int th, int tw, int legacy) {
    if (sh == th && sw == tw) {
        std::memcpy(dst, src, static_cast<size_t>(sh) * sw * 3);
        return;
    }
    const float sy = static_cast<float>(sh) / th;
    const float sx = static_cast<float>(sw) / tw;
    std::vector<int> x0s(tw), x1s(tw);
    std::vector<float> wxs(tw);
    for (int x = 0; x < tw; x++) {
        float fx = legacy ? x * sx : (x + 0.5f) * sx - 0.5f;
        if (fx < 0) fx = 0;
        if (fx > sw - 1) fx = static_cast<float>(sw - 1);
        int x0 = static_cast<int>(fx);
        x0s[x] = x0;
        x1s[x] = x0 + 1 < sw ? x0 + 1 : sw - 1;
        wxs[x] = fx - x0;
    }
    for (int y = 0; y < th; y++) {
        float fy = legacy ? y * sy : (y + 0.5f) * sy - 0.5f;
        if (fy < 0) fy = 0;
        if (fy > sh - 1) fy = static_cast<float>(sh - 1);
        int y0 = static_cast<int>(fy);
        int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
        float wy = fy - y0;
        const unsigned char* r0 = src + static_cast<size_t>(y0) * sw * 3;
        const unsigned char* r1 = src + static_cast<size_t>(y1) * sw * 3;
        unsigned char* out = dst + static_cast<size_t>(y) * tw * 3;
        for (int x = 0; x < tw; x++) {
            int x0 = x0s[x] * 3, x1 = x1s[x] * 3;
            float wx = wxs[x];
            for (int c = 0; c < 3; c++) {
                float top = r0[x0 + c] + (r0[x1 + c] - r0[x0 + c]) * wx;
                float bot = r1[x0 + c] + (r1[x1 + c] - r1[x0 + c]) * wx;
                float v = top + (bot - top) * wy;
                out[x * 3 + c] = static_cast<unsigned char>(v + 0.5f);
            }
        }
    }
}

// decode JPEG -> RGB; when 0 < (th, tw) < source dims, decode at the
// smallest sufficient DCT scale then bilinear to exactly (th, tw).
// Returns false with `err` set on corrupt input.
bool decode_impl(const unsigned char* data, size_t len, int th, int tw,
                 std::vector<unsigned char>& out, int& src_h, int& src_w,
                 int& out_h, int& out_w, std::string& err, int legacy = 0) {
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = err_exit;
    std::vector<unsigned char> raw;
    if (setjmp(jerr.jb)) {
        err = jerr.msg;
        jpeg_destroy_decompress(&cinfo);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
    jpeg_read_header(&cinfo, TRUE);
    src_h = static_cast<int>(cinfo.image_height);
    src_w = static_cast<int>(cinfo.image_width);
    cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr -> RGB in-decode
    // legacy (TF1-parity) mode decodes at full resolution: the reference
    // resized from the full image, so DCT-scaled decode would change the
    // input to the resize
    if (!legacy && th > 0 && tw > 0 && th < src_h && tw < src_w) {
        double f = static_cast<double>(th) / src_h;
        double fx = static_cast<double>(tw) / src_w;
        if (fx > f) f = fx;
        int num = static_cast<int>(f * 8.0);
        if (num * 1.0 < f * 8.0) num += 1;  // ceil: never below target
        if (num < 1) num = 1;
        if (num > 8) num = 8;
        cinfo.scale_num = static_cast<unsigned>(num);
        cinfo.scale_denom = 8;
    }
    jpeg_start_decompress(&cinfo);
    const int dh = static_cast<int>(cinfo.output_height);
    const int dw = static_cast<int>(cinfo.output_width);
    raw.resize(static_cast<size_t>(dh) * dw * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        unsigned char* row =
            raw.data() + static_cast<size_t>(cinfo.output_scanline) * dw * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);

    if (th > 0 && tw > 0) {
        out_h = th;
        out_w = tw;
        out.resize(static_cast<size_t>(th) * tw * 3);
        resize_bilinear(raw.data(), dh, dw, out.data(), th, tw, legacy);
    } else {
        out_h = dh;
        out_w = dw;
        out = std::move(raw);
    }
    return true;
}

// ---- Python bindings ----

PyObject* py_dims(PyObject*, PyObject* args) {
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
    jpeg_decompress_struct cinfo;
    ErrMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, jerr.msg);
        return nullptr;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_mem_src(&cinfo, static_cast<const unsigned char*>(buf.buf),
                 static_cast<unsigned long>(buf.len));
    jpeg_read_header(&cinfo, TRUE);
    int h = static_cast<int>(cinfo.image_height);
    int w = static_cast<int>(cinfo.image_width);
    jpeg_destroy_decompress(&cinfo);
    PyBuffer_Release(&buf);
    return Py_BuildValue("(ii)", h, w);
}

// decode(data, target_h=0, target_w=0) -> (pixels: bytes, src_h, src_w,
// out_h, out_w); pixels are RGB uint8 HWC
PyObject* py_decode(PyObject*, PyObject* args) {
    Py_buffer buf;
    int th = 0, tw = 0, legacy = 0;
    if (!PyArg_ParseTuple(args, "y*|iii", &buf, &th, &tw, &legacy))
        return nullptr;
    std::vector<unsigned char> out;
    int sh = 0, sw = 0, oh = 0, ow = 0;
    std::string err;
    bool ok;
    Py_BEGIN_ALLOW_THREADS
    ok = decode_impl(static_cast<const unsigned char*>(buf.buf),
                     static_cast<size_t>(buf.len), th, tw, out, sh, sw, oh,
                     ow, err, legacy);
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    if (!ok) {
        PyErr_SetString(PyExc_ValueError, err.c_str());
        return nullptr;
    }
    PyObject* pixels = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(out.data()),
        static_cast<Py_ssize_t>(out.size()));
    if (!pixels) return nullptr;
    return Py_BuildValue("(Niiii)", pixels, sh, sw, oh, ow);
}

// decode_batch(list[bytes], list[int], list[int], threads=4)
//   -> list[(pixels, src_h, src_w, out_h, out_w)]
PyObject* py_decode_batch(PyObject*, PyObject* args) {
    PyObject *blobs, *ths, *tws;
    int threads = 4, legacy = 0;
    if (!PyArg_ParseTuple(args, "OOO|ii", &blobs, &ths, &tws, &threads,
                          &legacy))
        return nullptr;
    PyObject* seq = PySequence_Fast(blobs, "decode_batch: blobs not a sequence");
    if (!seq) return nullptr;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
    PyObject* hseq = PySequence_Fast(ths, "decode_batch: heights not a sequence");
    PyObject* wseq = PySequence_Fast(tws, "decode_batch: widths not a sequence");
    if (!hseq || !wseq) {
        Py_DECREF(seq);
        Py_XDECREF(hseq);
        Py_XDECREF(wseq);
        return nullptr;
    }
    if (n < 1 || PySequence_Fast_GET_SIZE(hseq) != n ||
        PySequence_Fast_GET_SIZE(wseq) != n) {
        PyErr_Format(PyExc_ValueError,
                     "decode_batch: need len(blobs)==len(heights)==len(widths)"
                     ">=1, got %zd/%zd/%zd",
                     n, PySequence_Fast_GET_SIZE(hseq),
                     PySequence_Fast_GET_SIZE(wseq));
        Py_DECREF(seq); Py_DECREF(hseq); Py_DECREF(wseq);
        return nullptr;
    }
    struct Job {
        const unsigned char* data;
        size_t len;
        int th, tw;
        std::vector<unsigned char> out;
        int sh = 0, sw = 0, oh = 0, ow = 0;
        bool ok = false;
        std::string err;
    };
    std::vector<Job> jobs(static_cast<size_t>(n));
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject* b = PySequence_Fast_GET_ITEM(seq, i);
        char* p;
        Py_ssize_t len;
        if (PyBytes_AsStringAndSize(b, &p, &len) < 0) {
            Py_DECREF(seq); Py_DECREF(hseq); Py_DECREF(wseq);
            return nullptr;
        }
        jobs[i].data = reinterpret_cast<const unsigned char*>(p);
        jobs[i].len = static_cast<size_t>(len);
        jobs[i].th = static_cast<int>(
            PyLong_AsLong(PySequence_Fast_GET_ITEM(hseq, i)));
        jobs[i].tw = static_cast<int>(
            PyLong_AsLong(PySequence_Fast_GET_ITEM(wseq, i)));
    }
    if (PyErr_Occurred()) {
        Py_DECREF(seq); Py_DECREF(hseq); Py_DECREF(wseq);
        return nullptr;
    }
    if (threads < 1) threads = 1;
    if (threads > static_cast<int>(n)) threads = static_cast<int>(n);
    Py_BEGIN_ALLOW_THREADS
    std::atomic<size_t> next(0);
    auto worker = [&]() {
        for (;;) {
            size_t i = next.fetch_add(1);
            if (i >= jobs.size()) break;
            Job& j = jobs[i];
            j.ok = decode_impl(j.data, j.len, j.th, j.tw, j.out, j.sh, j.sw,
                               j.oh, j.ow, j.err, legacy);
        }
    };
    if (threads <= 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < threads; t++) pool.emplace_back(worker);
        for (auto& t : pool) t.join();
    }
    Py_END_ALLOW_THREADS
    PyObject* result = PyList_New(n);
    for (Py_ssize_t i = 0; i < n; i++) {
        Job& j = jobs[static_cast<size_t>(i)];
        if (!j.ok) {
            Py_DECREF(result); Py_DECREF(seq); Py_DECREF(hseq); Py_DECREF(wseq);
            PyErr_SetString(PyExc_ValueError, j.err.c_str());
            return nullptr;
        }
        PyObject* pixels = PyBytes_FromStringAndSize(
            reinterpret_cast<const char*>(j.out.data()),
            static_cast<Py_ssize_t>(j.out.size()));
        PyObject* tup = Py_BuildValue("(Niiii)", pixels, j.sh, j.sw, j.oh, j.ow);
        PyList_SET_ITEM(result, i, tup);
    }
    Py_DECREF(seq);
    Py_DECREF(hseq);
    Py_DECREF(wseq);
    return result;
}

PyMethodDef methods[] = {
    {"dims", py_dims, METH_VARARGS,
     "dims(jpeg_bytes) -> (height, width) from the header only"},
    {"decode", py_decode, METH_VARARGS,
     "decode(jpeg_bytes, target_h=0, target_w=0, legacy=0) -> (rgb_bytes, src_h, "
     "src_w, out_h, out_w); fused DCT-scaled decode + bilinear resize"},
    {"decode_batch", py_decode_batch, METH_VARARGS,
     "decode_batch(blobs, target_hs, target_ws, threads=4, legacy=0) -> list of "
     "decode() tuples, thread-pooled with the GIL released"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_imgcodec_ext",
    "fused JPEG decode + resize (libjpeg, GIL-free)", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__imgcodec_ext(void) { return PyModule_Create(&moduledef); }
