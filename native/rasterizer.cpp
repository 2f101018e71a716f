// Software triangle rasterizer for the FLAME render service.
//
// Replaces the reference's pyrender/EGL/OSMesa OpenGL stack
// (render_tools.py:17-87) with a dependency-free scanline rasterizer:
// perspective intrinsics camera, z-buffered barycentric interpolation,
// smooth per-vertex normals, Lambertian shading with ambient + N point
// lights, optional per-vertex colors. Frames are rasterized in parallel
// with OpenMP; meshes are tiny (5k vertices, 10k triangles), so this path
// is IO-bound on video encoding, not on rasterization.
//
// C ABI for ctypes. All buffers are caller-allocated.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <vector>

extern "C" {

struct Camera {
    float fx, fy, cx, cy;   // intrinsics (pixels)
    float tx, ty, tz;       // camera position (world); looks along -z, y up
    float znear, zfar;
};

struct PointLight {
    float x, y, z;          // world position
    float r, g, b;          // color
    float intensity;
};

// Render one frame containing n_meshes meshes.
//
// vertices: concatenated [total_verts, 3] float32 (world space)
// colors:   concatenated [total_verts, 3] float32 (0..1 per-vertex albedo)
// faces:    concatenated [total_faces, 3] int32, indices local to each mesh
// mesh_vert_offsets / mesh_face_offsets: [n_meshes + 1] prefix offsets
// uvs: optional per-face-corner texture coords [total_faces, 3, 2] float32
//      (FLAME ships a separate vt/ft table, so UVs live on corners, not
//      vertices — seams stay sharp). NULL -> per-vertex-color shading.
// textures: optional [n_meshes, tex_h, tex_w, 3] uint8 (one per mesh);
//      sampled bilinearly, modulated by the interpolated Gouraud lighting
//      (per-vertex colors then act as a tint — pass 1.0 for pure texture).
// image: [height, width, 3] uint8, preset by caller (background)
// depth: [height, width] float32 scratch, caller-allocated
void render_frame(
    const float* vertices, const float* colors,
    const int32_t* faces,
    const int64_t* mesh_vert_offsets, const int64_t* mesh_face_offsets,
    int32_t n_meshes,
    const Camera* cam,
    const PointLight* lights, int32_t n_lights,
    float ambient_r, float ambient_g, float ambient_b,
    const float* uvs, const uint8_t* textures,
    int32_t tex_w, int32_t tex_h,
    uint8_t* image, float* depth,
    int32_t width, int32_t height)
{
    const bool textured = uvs != nullptr && textures != nullptr;
    const int64_t total_verts = mesh_vert_offsets[n_meshes];

    for (int64_t i = 0; i < (int64_t)width * height; i++) depth[i] = 1e30f;

    // ---- per-vertex smooth normals (area-weighted) ----
    std::vector<float> normals(total_verts * 3, 0.0f);
    for (int m = 0; m < n_meshes; m++) {
        const int64_t v0off = mesh_vert_offsets[m];
        for (int64_t f = mesh_face_offsets[m]; f < mesh_face_offsets[m + 1]; f++) {
            const int64_t ia = v0off + faces[f * 3 + 0];
            const int64_t ib = v0off + faces[f * 3 + 1];
            const int64_t ic = v0off + faces[f * 3 + 2];
            const float* a = vertices + ia * 3;
            const float* b = vertices + ib * 3;
            const float* c = vertices + ic * 3;
            const float e1x = b[0]-a[0], e1y = b[1]-a[1], e1z = b[2]-a[2];
            const float e2x = c[0]-a[0], e2y = c[1]-a[1], e2z = c[2]-a[2];
            const float nx = e1y*e2z - e1z*e2y;
            const float ny = e1z*e2x - e1x*e2z;
            const float nz = e1x*e2y - e1y*e2x;
            for (int64_t idx : {ia, ib, ic}) {
                normals[idx*3+0] += nx;
                normals[idx*3+1] += ny;
                normals[idx*3+2] += nz;
            }
        }
    }
    for (int64_t v = 0; v < total_verts; v++) {
        float* nv = normals.data() + v * 3;
        const float len = std::sqrt(nv[0]*nv[0] + nv[1]*nv[1] + nv[2]*nv[2]);
        if (len > 1e-12f) { nv[0] /= len; nv[1] /= len; nv[2] /= len; }
    }

    // ---- per-vertex lighting (Gouraud): ambient + Lambertian point lights ----
    std::vector<float> lit(total_verts * 3);
    for (int64_t v = 0; v < total_verts; v++) {
        const float* p = vertices + v * 3;
        const float* nv = normals.data() + v * 3;
        const float* alb = colors + v * 3;
        float r = ambient_r, g = ambient_g, b = ambient_b;
        for (int l = 0; l < n_lights; l++) {
            const PointLight& L = lights[l];
            float lx = L.x - p[0], ly = L.y - p[1], lz = L.z - p[2];
            const float dist2 = lx*lx + ly*ly + lz*lz;
            const float inv = 1.0f / std::sqrt(std::max(dist2, 1e-12f));
            lx *= inv; ly *= inv; lz *= inv;
            float ndl = nv[0]*lx + nv[1]*ly + nv[2]*lz;
            if (ndl < 0.0f) ndl = -ndl;   // two-sided (SKIP_CULL_FACES look)
            const float att = L.intensity;  // pyrender point lights: no falloff by default scale
            r += L.r * ndl * att;
            g += L.g * ndl * att;
            b += L.b * ndl * att;
        }
        lit[v*3+0] = std::min(r, 1.0f) * alb[0];
        lit[v*3+1] = std::min(g, 1.0f) * alb[1];
        lit[v*3+2] = std::min(b, 1.0f) * alb[2];
    }

    // ---- project vertices to screen ----
    std::vector<float> sx(total_verts), sy(total_verts), sz(total_verts);
    for (int64_t v = 0; v < total_verts; v++) {
        const float* p = vertices + v * 3;
        const float xc = p[0] - cam->tx;
        const float yc = p[1] - cam->ty;
        const float zc = p[2] - cam->tz;     // camera looks along -z
        const float d = -zc;                 // positive depth in front
        if (d <= cam->znear) { sz[v] = -1.0f; continue; }
        sx[v] = cam->cx + cam->fx * (xc / d);
        sy[v] = cam->cy - cam->fy * (yc / d);
        sz[v] = d;
    }

    // ---- rasterize triangles with z-buffer ----
    for (int m = 0; m < n_meshes; m++) {
        const int64_t v0off = mesh_vert_offsets[m];
        const uint8_t* tex = textured
            ? textures + (int64_t)m * tex_h * tex_w * 3 : nullptr;
        for (int64_t f = mesh_face_offsets[m]; f < mesh_face_offsets[m + 1]; f++) {
            const int64_t ia = v0off + faces[f * 3 + 0];
            const int64_t ib = v0off + faces[f * 3 + 1];
            const int64_t ic = v0off + faces[f * 3 + 2];
            if (sz[ia] <= 0 || sz[ib] <= 0 || sz[ic] <= 0) continue;

            const float ax = sx[ia], ay = sy[ia];
            const float bx = sx[ib], by = sy[ib];
            const float cx_ = sx[ic], cy_ = sy[ic];

            const int x0 = std::max(0, (int)std::floor(std::min({ax, bx, cx_})));
            const int x1 = std::min(width - 1, (int)std::ceil(std::max({ax, bx, cx_})));
            const int y0 = std::max(0, (int)std::floor(std::min({ay, by, cy_})));
            const int y1 = std::min(height - 1, (int)std::ceil(std::max({ay, by, cy_})));
            if (x0 > x1 || y0 > y1) continue;

            const float denom = (by - cy_) * (ax - cx_) + (cx_ - bx) * (ay - cy_);
            if (std::fabs(denom) < 1e-12f) continue;
            const float inv_denom = 1.0f / denom;

            // perspective-correct: interpolate 1/z and attr/z
            const float iza = 1.0f / sz[ia], izb = 1.0f / sz[ib], izc = 1.0f / sz[ic];

            for (int py = y0; py <= y1; py++) {
                for (int px = x0; px <= x1; px++) {
                    const float fx_ = px + 0.5f, fy_ = py + 0.5f;
                    float w0 = ((by - cy_) * (fx_ - cx_) + (cx_ - bx) * (fy_ - cy_)) * inv_denom;
                    float w1 = ((cy_ - ay) * (fx_ - cx_) + (ax - cx_) * (fy_ - cy_)) * inv_denom;
                    float w2 = 1.0f - w0 - w1;
                    if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                    const float iz = w0 * iza + w1 * izb + w2 * izc;
                    const float z = 1.0f / iz;
                    if (z >= depth[(int64_t)py * width + px]) continue;
                    if (z > cam->zfar) continue;
                    depth[(int64_t)py * width + px] = z;
                    // perspective-correct color weights
                    const float pw0 = w0 * iza * z, pw1 = w1 * izb * z, pw2 = w2 * izc * z;
                    uint8_t* pix = image + ((int64_t)py * width + px) * 3;
                    float texel[3] = {1.0f, 1.0f, 1.0f};
                    if (tex) {
                        // perspective-correct UV, bilinear sample
                        const float* fuv = uvs + f * 6;
                        float u = pw0*fuv[0] + pw1*fuv[2] + pw2*fuv[4];
                        float v = pw0*fuv[1] + pw1*fuv[3] + pw2*fuv[5];
                        u = std::min(std::max(u, 0.0f), 1.0f) * (tex_w - 1);
                        v = (1.0f - std::min(std::max(v, 0.0f), 1.0f)) * (tex_h - 1);
                        const int u0 = (int)u, v0i = (int)v;
                        const int u1 = std::min(u0 + 1, tex_w - 1);
                        const int v1i = std::min(v0i + 1, tex_h - 1);
                        const float fu = u - u0, fv = v - v0i;
                        for (int ch = 0; ch < 3; ch++) {
                            const float t00 = tex[((int64_t)v0i*tex_w + u0)*3 + ch];
                            const float t01 = tex[((int64_t)v0i*tex_w + u1)*3 + ch];
                            const float t10 = tex[((int64_t)v1i*tex_w + u0)*3 + ch];
                            const float t11 = tex[((int64_t)v1i*tex_w + u1)*3 + ch];
                            texel[ch] = ((t00*(1-fu) + t01*fu) * (1-fv)
                                       + (t10*(1-fu) + t11*fu) * fv) / 255.0f;
                        }
                    }
                    for (int ch = 0; ch < 3; ch++) {
                        float val = pw0 * lit[ia*3+ch] + pw1 * lit[ib*3+ch]
                                  + pw2 * lit[ic*3+ch];
                        val *= texel[ch];
                        pix[ch] = (uint8_t)std::min(std::max(val, 0.0f) * 255.0f, 255.0f);
                    }
                }
            }
        }
    }
}

// Batched version: frames rendered in parallel (OpenMP).
// vertices: [n_frames, total_verts, 3]; images: [n_frames, H, W, 3] preset
// to the background color by the caller.
void render_frames(
    const float* vertices, const float* colors,
    const int32_t* faces,
    const int64_t* mesh_vert_offsets, const int64_t* mesh_face_offsets,
    int32_t n_meshes,
    const Camera* cam,
    const PointLight* lights, int32_t n_lights,
    float ambient_r, float ambient_g, float ambient_b,
    const float* uvs, const uint8_t* textures,
    int32_t tex_w, int32_t tex_h,
    uint8_t* images, int32_t n_frames,
    int32_t width, int32_t height)
{
    const int64_t total_verts = mesh_vert_offsets[n_meshes];
    const int64_t frame_px = (int64_t)width * height;

    #pragma omp parallel
    {
        std::vector<float> depth(frame_px);
        #pragma omp for schedule(dynamic)
        for (int32_t t = 0; t < n_frames; t++) {
            render_frame(vertices + t * total_verts * 3, colors, faces,
                         mesh_vert_offsets, mesh_face_offsets, n_meshes,
                         cam, lights, n_lights,
                         ambient_r, ambient_g, ambient_b,
                         uvs, textures, tex_w, tex_h,
                         images + t * frame_px * 3, depth.data(),
                         width, height);
        }
    }
}

}  // extern "C"
