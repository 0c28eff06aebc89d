import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kornia_tpu.geometry.bbox import (bbox_generator, bbox_to_mask,
                                      infer_bbox_shape, nms, transform_bbox)
from kornia_tpu.geometry.boxes import Boxes, Keypoints
from kornia_tpu.geometry.line import (Hyperplane, ParametrizedLine, Ray,
                                      fit_line, fit_plane)
from kornia_tpu.image import ColorSpace, Image, draw_rectangle
from kornia_tpu.io import ImageLoadType, load_image, write_image


class TestBbox:
    def test_generator(self):
        b = bbox_generator(jnp.array([1.0]), jnp.array([2.0]),
                           jnp.array([3.0]), jnp.array([4.0]))
        np.testing.assert_allclose(
            b[0], [[1, 2], [3, 2], [3, 5], [1, 5]])

    def test_infer_shape(self):
        b = bbox_generator(jnp.array([1.0]), jnp.array([2.0]),
                           jnp.array([3.0]), jnp.array([4.0]))
        h, w = infer_bbox_shape(b)
        assert float(h[0]) == 4 and float(w[0]) == 3

    def test_to_mask(self):
        b = bbox_generator(jnp.array([1.0]), jnp.array([1.0]),
                           jnp.array([2.0]), jnp.array([2.0]))
        m = bbox_to_mask(b, 5, 5)
        assert float(m.sum()) == 4.0
        assert float(m[0, 1, 1]) == 1.0

    def test_transform(self):
        boxes = jnp.array([[[1.0, 1.0, 3.0, 3.0]]])
        M = jnp.eye(3).at[0, 2].set(2.0)[None]
        out = transform_bbox(M, boxes)
        np.testing.assert_allclose(out[0, 0], [3, 1, 5, 3], atol=1e-5)

    def test_nms(self):
        boxes = jnp.array([[0.0, 0, 10, 10], [1.0, 1, 11, 11],
                           [20.0, 20, 30, 30]])
        scores = jnp.array([0.9, 0.8, 0.7])
        keep = nms(boxes, scores, 0.5)
        kept = set(np.asarray(keep)[np.asarray(keep) >= 0].tolist())
        assert kept == {0, 2}


class TestContainers:
    def test_boxes_roundtrip(self):
        b = Boxes.from_tensor(jnp.array([[[1.0, 2, 5, 7]]]))
        np.testing.assert_allclose(b.to_tensor("xywh"), [[[1, 2, 4, 5]]])
        assert b.to_tensor("vertices").shape == (1, 1, 4, 2)

    def test_boxes_area_filter(self):
        b = Boxes.from_tensor(jnp.array([[[0.0, 0, 2, 2], [0.0, 0, 10, 10]]]))
        f = b.filter_boxes_by_area(min_area=20)
        np.testing.assert_array_equal(f.valid, [[False, True]])

    def test_boxes_transform(self):
        b = Boxes.from_tensor(jnp.array([[[1.0, 1, 3, 3]]]))
        M = jnp.eye(3).at[1, 2].set(5.0)[None]
        out = b.transform_boxes(M)
        np.testing.assert_allclose(out.data[0, 0], [1, 6, 3, 8], atol=1e-5)

    def test_keypoints(self):
        kp = Keypoints.from_tensor(jnp.array([[[2.0, 3.0], [50.0, 3.0]]]))
        kp2 = kp.mark_outside(10, 10)
        np.testing.assert_array_equal(kp2.valid, [[True, False]])
        M = jnp.eye(3).at[0, 2].set(1.0)[None]
        np.testing.assert_allclose(kp.transform_keypoints(M).data[0, 0],
                                   [3.0, 3.0], atol=1e-6)

    def test_pytree(self):
        b = Boxes.from_tensor(jnp.array([[[1.0, 2, 5, 7]]]))
        out = jax.jit(lambda bx: bx.compute_area())(b)
        np.testing.assert_allclose(out, [[20.0]], atol=1e-5)


class TestLinePlane:
    def test_line_through(self):
        l = ParametrizedLine.through(jnp.array([0.0, 0]), jnp.array([2.0, 0]))
        np.testing.assert_allclose(l.point_at(jnp.array(3.0)), [3, 0], atol=1e-6)
        assert float(l.distance(jnp.array([1.0, 5.0]))) == pytest.approx(5.0)

    def test_fit_line(self, key):
        t = jnp.linspace(0, 1, 20)[:, None]
        d = jnp.array([[0.6, 0.8]])
        pts = (jnp.array([[1.0, 2.0]]) + t * d)[None]
        line = fit_line(pts)
        got = np.abs(np.asarray(line.direction[0]))
        np.testing.assert_allclose(got, [0.6, 0.8], atol=1e-4)

    def test_fit_plane(self, key):
        k1, k2 = jax.random.split(key)
        xy = jax.random.normal(k1, (1, 50, 2))
        z = 0.3 * xy[..., :1] - 0.2 * xy[..., 1:] + 1.0
        pts = jnp.concatenate([xy, z], -1)
        plane = fit_plane(pts)
        d = plane.signed_distance(pts[0])
        assert float(jnp.abs(d).max()) < 1e-4

    def test_ray_plane(self):
        ray = Ray.through(jnp.array([0.0, 0, 0]), jnp.array([0.0, 0, 1]))
        plane = Hyperplane.from_vector(jnp.array([0.0, 0, 1.0]),
                                       jnp.array([0.0, 0, 5.0]))
        hit = ray.intersect_plane(plane)
        np.testing.assert_allclose(hit, [0, 0, 5], atol=1e-5)


class TestImageIO:
    def test_image_container(self):
        arr = (np.random.default_rng(0).random((8, 6, 3)) * 255).astype(np.uint8)
        img = Image.from_numpy(arr)
        assert img.shape == (3, 8, 6)
        assert img.channels == 3 and img.height == 8 and img.width == 6
        f = img.to_float()
        assert float(f.data.max()) <= 1.0
        g = img.to_gray()
        assert g.channels == 1

    def test_file_roundtrip(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t.png")
            arr = (np.random.default_rng(0).random((8, 6, 3)) * 255).astype(
                np.uint8)
            Image.from_numpy(arr).write(path)
            back = Image.from_file(path)
            np.testing.assert_array_equal(back.to_numpy(),
                                          np.moveaxis(arr, -1, 0))

    def test_load_write_functional(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "t.png")
            img = jnp.asarray(
                np.random.default_rng(0).random((3, 8, 8)).astype(np.float32))
            write_image(path, img)
            back = load_image(path, ImageLoadType.RGB32)
            assert back.shape == (3, 8, 8)
            np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-3)

    def test_draw_rectangle(self):
        img = jnp.zeros((1, 3, 10, 10))
        out = draw_rectangle(img, jnp.array([[[2.0, 2, 7, 7]]]),
                             jnp.array([1.0, 0, 0]), fill=True)
        assert float(out[0, 0, 4, 4]) == 1.0
        assert float(out[0, 1, 4, 4]) == 0.0
        assert float(out[0, 0, 0, 0]) == 0.0
