/* fastio: native IO hot paths for gaussian_mesh_splatting_tpu.
 *
 * The reference ships C++/CUDA for its compute kernels and relies on C
 * libraries (plyfile's C parser, COLMAP) for IO. Here the TPU compute path
 * is Pallas/XLA; the native runtime component is this CPython extension
 * covering the host-side IO hot paths:
 *
 *   - parse_ply_vertices(bytes, header_offset, n, prop_names, prop_sizes)
 *       -> list of 1-D float32/uint8 numpy arrays (column-major split of a
 *          packed binary_little_endian vertex element). Training scenes
 *          load millions of Gaussians; the numpy fallback materializes an
 *          intermediate record array, this parser writes columns directly.
 *   - parse_colmap_points3d(bytes) -> (xyz f64 (N,3), rgb u8 (N,3), err f64 (N,1))
 *       COLMAP points3D.bin with variable-length track lists — a format a
 *       vectorized numpy reader cannot express without a Python loop.
 *
 * Built on demand by io/native.py via cc; pure-numpy fallbacks remain in
 * io/ply.py and scene/colmap_loader.py.
 */
#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>
#include <stdint.h>
#include <string.h>

static PyObject *
parse_ply_vertices(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    Py_ssize_t offset, count;
    PyObject *sizes_obj; /* list of per-property byte sizes (4=f32, 1=u8) */
    if (!PyArg_ParseTuple(args, "y*nnO", &buf, &offset, &count, &sizes_obj))
        return NULL;

    Py_ssize_t nprops = PyList_Size(sizes_obj);
    long *sizes = (long *)malloc(sizeof(long) * (size_t)nprops);
    long stride = 0;
    for (Py_ssize_t i = 0; i < nprops; i++) {
        sizes[i] = PyLong_AsLong(PyList_GetItem(sizes_obj, i));
        stride += sizes[i];
    }
    if (offset + count * stride > buf.len) {
        free(sizes);
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "buffer too small for vertex element");
        return NULL;
    }

    PyObject *out = PyList_New(nprops);
    const char *base = (const char *)buf.buf + offset;

    long col_off = 0;
    for (Py_ssize_t i = 0; i < nprops; i++) {
        npy_intp dims[1] = {count};
        int typ = sizes[i] == 4 ? NPY_FLOAT32 : NPY_UINT8;
        PyArrayObject *arr = (PyArrayObject *)PyArray_SimpleNew(1, dims, typ);
        char *dst = (char *)PyArray_DATA(arr);
        const char *src = base + col_off;
        const long sz = sizes[i];
        for (Py_ssize_t r = 0; r < count; r++) {
            memcpy(dst + r * sz, src + r * stride, (size_t)sz);
        }
        PyList_SET_ITEM(out, i, (PyObject *)arr);
        col_off += sizes[i];
    }
    free(sizes);
    PyBuffer_Release(&buf);
    return out;
}

static PyObject *
parse_colmap_points3d(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    const uint8_t *p = (const uint8_t *)buf.buf;
    const uint8_t *end = p + buf.len;
    if (buf.len < 8) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "truncated points3D.bin");
        return NULL;
    }
    uint64_t n;
    memcpy(&n, p, 8);
    p += 8;

    npy_intp d3[2] = {(npy_intp)n, 3};
    npy_intp d1[2] = {(npy_intp)n, 1};
    PyArrayObject *xyz = (PyArrayObject *)PyArray_SimpleNew(2, d3, NPY_FLOAT64);
    PyArrayObject *rgb = (PyArrayObject *)PyArray_SimpleNew(2, d3, NPY_UINT8);
    PyArrayObject *err = (PyArrayObject *)PyArray_SimpleNew(2, d1, NPY_FLOAT64);
    double *xyz_d = (double *)PyArray_DATA(xyz);
    uint8_t *rgb_d = (uint8_t *)PyArray_DATA(rgb);
    double *err_d = (double *)PyArray_DATA(err);

    for (uint64_t i = 0; i < n; i++) {
        /* id(8) xyz(24) rgb(3) err(8) track_len(8) track(8*len) */
        if (p + 51 > end) goto truncated;
        memcpy(&xyz_d[i * 3], p + 8, 24);
        memcpy(&rgb_d[i * 3], p + 32, 3);
        memcpy(&err_d[i], p + 35, 8);
        uint64_t track_len;
        memcpy(&track_len, p + 43, 8);
        p += 51 + track_len * 8;
        if (p > end) goto truncated;
    }
    PyBuffer_Release(&buf);
    return Py_BuildValue("(NNN)", xyz, rgb, err);

truncated:
    Py_DECREF(xyz);
    Py_DECREF(rgb);
    Py_DECREF(err);
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "truncated points3D.bin record");
    return NULL;
}

static PyMethodDef Methods[] = {
    {"parse_ply_vertices", parse_ply_vertices, METH_VARARGS,
     "Split packed binary PLY vertex records into column arrays."},
    {"parse_colmap_points3d", parse_colmap_points3d, METH_VARARGS,
     "Parse COLMAP points3D.bin into (xyz, rgb, error) arrays."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "fastio", NULL, -1, Methods};

PyMODINIT_FUNC
PyInit_fastio(void)
{
    import_array();
    return PyModule_Create(&moduledef);
}
