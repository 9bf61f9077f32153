// Native path-matrix accumulation for the classical tomography baseline.
//
// C++ twin of the inner marching loop of pathmatrix/path_matrix.py
// (construct_voxel_matrix): for each ray, march the linear path between its
// cube entry and exit points in int_res substeps, accumulate arc length per
// visited voxel, and emit COO triplets whenever the voxel id changes (and at
// the last substep).  The Python/numpy version allocates O(int_res) temporary
// arrays and concatenates chunk lists; this version is a single cache-friendly
// pass per ray emitting directly into caller-provided buffers.
//
// The reference implements this layer natively too (its enoki/CUDA core);
// here the TPU owns the tracing and this host-side operator assembly is the
// natural native component.
//
// Build: g++ -O3 -march=native -shared -fPIC pathmatrix.cpp -o libpathmatrix.so
// ABI (ctypes): see loader.py.

#include <cmath>
#include <cstdint>

extern "C" {

// Returns the number of emitted triplets.  Caller must size out_* to at
// least num_rays * (int_res + 1) entries (at most one emit per substep
// plus the final flush; see loader.py).
int64_t accumulate_linear_paths(
    const double* spos,   // (num_rays, dim) entry points
    const double* epos,   // (num_rays, dim) exit points
    int64_t num_rays,
    int32_t dim_count,    // 2 or 3
    double box_dim,       // voxel edge length
    int32_t res,          // voxels per axis
    int32_t int_res,      // substeps per ray
    double* out_data,     // path lengths
    int64_t* out_row,     // ray index
    int64_t* out_col)     // flat voxel index
{
    const double inv_box = 1.0 / box_dim;
    int64_t count = 0;

    for (int64_t r = 0; r < num_rays; ++r) {
        const double* p0 = spos + r * dim_count;
        const double* p1 = epos + r * dim_count;

        double seg2 = 0.0;
        for (int d = 0; d < dim_count; ++d) {
            const double dd = (p1[d] - p0[d]) / int_res;
            seg2 += dd * dd;
        }
        const double seg_len = std::sqrt(seg2);  // constant per substep

        auto voxel_of = [&](double t) -> int64_t {
            int64_t ind = 0;
            int64_t stride = 1;
            for (int d = 0; d < dim_count; ++d) {
                const double p = (1.0 - t) * p0[d] + t * p1[d];
                int64_t i = (int64_t)std::floor(p * inv_box);
                if (i < 0) i = 0;
                if (i > res - 1) i = res - 1;
                ind += i * stride;
                stride *= res;
            }
            return ind;
        };

        int64_t ind_pre = voxel_of(0.0);
        double dist = 0.0;
        for (int32_t j = 0; j < int_res; ++j) {
            const double t = (double)(j + 1) / int_res;
            const int64_t ind_cur = voxel_of(t);
            dist += seg_len;
            if (ind_cur != ind_pre || j == int_res - 1) {
                out_data[count] = dist;
                out_row[count] = r;
                out_col[count] = ind_pre;
                ++count;
                dist = 0.0;
                ind_pre = ind_cur;
            }
        }
    }
    return count;
}

}  // extern "C"
