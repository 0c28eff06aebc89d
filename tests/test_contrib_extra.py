import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestDetectionAPIs:
    def test_object_detector(self, key):
        from kornia_tpu.contrib.detection import BoxFiltering, ObjectDetector
        det = ObjectDetector(num_classes=4, input_size=64, max_detections=16)
        out = det(jax.random.uniform(key, (1, 3, 80, 96)))
        assert out.shape == (1, 16, 6)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_box_filtering(self):
        from kornia_tpu.contrib.detection import BoxFiltering
        dets = jnp.array([[[0.0, 0.9, 1, 1, 5, 5], [1.0, 0.1, 2, 2, 5, 5]]])
        out = BoxFiltering(0.5)(dets)
        assert float(out[0, 0, 1]) == pytest.approx(0.9)
        np.testing.assert_allclose(out[0, 1], 0.0)

    def test_face_detector(self, key):
        from kornia_tpu.contrib.detection import FaceDetector
        fd = FaceDetector(top_k=8)
        res = fd(jax.random.uniform(key, (2, 3, 64, 64)))
        assert len(res) == 2
        assert res[0].data.shape == (8, 15)
        kp = res[0].get_keypoint(0)
        assert kp.shape == (8, 2)

    def test_edge_detector(self, key):
        from kornia_tpu.contrib.detection import EdgeDetector
        ed = EdgeDetector()
        out = ed(jax.random.uniform(key, (1, 3, 32, 32)))
        assert out.shape == (1, 1, 32, 32)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


class TestAdalam:
    def test_filters_outliers(self, key):
        from kornia_tpu.feature.adalam import adalam_filter
        kp0 = jax.random.uniform(key, (256, 2)) * 200
        A = jnp.array([[1.05, 0.08], [-0.06, 0.98]])
        kp1 = kp0 @ A.T + jnp.array([10.0, -5.0])
        kp1 = kp1.at[:64].set(
            jax.random.uniform(jax.random.fold_in(key, 1), (64, 2)) * 200)
        keep = adalam_filter(kp0, kp1)
        assert float(keep[64:].mean()) > 0.9
        assert float(keep[:64].mean()) < 0.1


class TestScene:
    def test_generate_scene(self, key):
        from kornia_tpu.geometry.epipolar import sampson_epipolar_distance
        from kornia_tpu.geometry.scene import generate_scene
        s = generate_scene(key, 3, 32)
        assert s["points2d"].shape == (3, 32, 2)
        d = sampson_epipolar_distance(
            s["points2d"][0][None], s["points2d"][1][None], s["F_01"][None])
        assert float(d.max()) < 1e-4


class TestColormapPrint:
    def test_colormap(self):
        from kornia_tpu.ops.colormap import ColorMap, ColorMapType
        cm = ColorMap(ColorMapType.jet, 32)
        g = jnp.linspace(0, 1, 16).reshape(1, 1, 4, 4)
        out = cm(g)
        assert out.shape == (1, 3, 4, 4)
        assert bool(jnp.all((out >= 0) & (out <= 1)))

    def test_image_to_string(self):
        from kornia_tpu.image.image_print import image_to_string
        img = np.random.default_rng(0).random((3, 8, 8)).astype(np.float32)
        s = image_to_string(img)
        assert "▀" in s and "\x1b[" in s


class TestSamScaffold:
    def test_sam(self, key):
        from kornia_tpu.models.sam import Sam, SamConfig
        sam = Sam(SamConfig(image_size=64, patch_size=16,
                            encoder_embed_dim=32, encoder_depth=1,
                            encoder_num_heads=2,
                            encoder_global_attn_indexes=(0,),
                            prompt_embed_dim=32, mask_in_chans=8,
                            decoder_num_heads=2, decoder_mlp_dim=64))
        masks, iou = sam(jax.random.uniform(key, (1, 3, 64, 64)),
                         jnp.array([[[32.0, 32.0]]]), jnp.array([[1]]))
        assert masks.shape == (1, 3, 16, 16)
        assert iou.shape == (1, 3)
