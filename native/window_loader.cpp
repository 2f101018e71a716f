// Native window-batch gatherer for the training input pipeline.
//
// The dataset is a set of contiguous per-modality feature arrays; a training
// batch is B sliding windows of seq_len frames gathered at random starts
// (lets_face_it_tpu/data/windows.py). This replaces numpy's single-threaded
// fancy-index copy with an OpenMP parallel gather into a caller-owned,
// reusable output buffer — keeping batch assembly off the critical path of
// the accelerator step (the role the reference delegated to 8 torch
// DataLoader worker processes, mimicry_data_module.py:101-108).

#include <cstdint>
#include <cstring>

extern "C" {

// src:  [total_frames, dim] float32
// out:  [n_windows, seq_len, dim] float32
// starts: [n_windows] int64 frame offsets into src
void gather_windows(
    const float* src, int64_t dim,
    const int64_t* starts, int64_t n_windows, int64_t seq_len,
    float* out)
{
    const int64_t row_bytes = dim * sizeof(float);
    #pragma omp parallel for schedule(static)
    for (int64_t w = 0; w < n_windows; w++) {
        const float* src_base = src + starts[w] * dim;
        float* dst_base = out + w * seq_len * dim;
        std::memcpy(dst_base, src_base, (size_t)(seq_len * row_bytes));
    }
}

// Gather several modalities in one call (fewer FFI crossings).
// srcs[m]: pointer to modality m's [total_frames, dim_m] array
// outs[m]: pointer to modality m's [n_windows, seq_len, dim_m] output
void gather_windows_multi(
    const float* const* srcs, const int64_t* dims, int64_t n_modalities,
    const int64_t* starts, int64_t n_windows, int64_t seq_len,
    float* const* outs)
{
    #pragma omp parallel for schedule(static) collapse(2)
    for (int64_t m = 0; m < n_modalities; m++) {
        for (int64_t w = 0; w < n_windows; w++) {
            const int64_t dim = dims[m];
            const float* src_base = srcs[m] + starts[w] * dim;
            float* dst_base = outs[m] + (w * seq_len) * dim;
            std::memcpy(dst_base, src_base,
                        (size_t)(seq_len * dim * sizeof(float)));
        }
    }
}

}  // extern "C"
