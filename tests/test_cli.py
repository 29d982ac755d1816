import os

import pytest

from vqwild_tpu.apps import cli


class TestParse:
    def test_defaults_mirror_reference(self):
        cfg, extra = cli.parse([])
        assert cfg.model.method == "baseline"
        assert cfg.data.meta_split == "100_20_80"
        assert cfg.data.input_size == 112
        assert cfg.data.train_frame == 32
        assert cfg.data.batch_size == 10
        assert cfg.data.test_batch_size == 30
        assert cfg.train.epochs == 16
        assert cfg.train.init_lr == 1e-4
        assert cfg.train.lr_decay_rate == 9
        assert cfg.train.weight_decay == 1e-5
        assert cfg.train.eval_per_epoch == 2
        assert cfg.model.dropout == 0.5
        assert cfg.model.moving_average == 0.9
        assert cfg.eval.query_num == 1
        assert cfg.eval.clip_sec == 6
        assert not extra["evaluate"]

    def test_moving_average_is_float(self):
        # upstream bug: type=int truncates CLI overrides (main.py:158)
        cfg, _ = cli.parse(["--moving_average", "0.75"])
        assert cfg.model.moving_average == 0.75

    def test_debug_caps_epochs(self):
        cfg, _ = cli.parse(["--debug"])
        assert cfg.train.epochs == 2 and cfg.train.debug

    def test_evaluate_forces_cache(self):
        cfg, _ = cli.parse(["--evaluate"])
        assert cfg.eval.read_cache_feat

    def test_export_torch_flag(self):
        _, extra = cli.parse(["--export_torch", "/tmp/out.pth.tar"])
        assert extra["export_torch"] == "/tmp/out.pth.tar"

    def test_semantic_dim_inference(self):
        cfg, _ = cli.parse(["--semantic_json", "wordembed_fasttext_d300.json"])
        assert cfg.model.semantic_dim == 300

    def test_all_meta_splits_accepted(self):
        for split in ["100_20_80", "120_20_60", "80_20_100", "40_20_140"]:
            cfg, _ = cli.parse(["--meta_split", split])
            assert cfg.data.meta_split == split

    def test_run_name_convention(self):
        cfg, _ = cli.parse(["--method", "vasa", "--novel_num", "3"])
        assert cfg.run_name() == "main_vasa_novel3_mv0.9"


class TestResolveDataFile:
    def test_finds_in_data_root(self, tmp_path):
        p = tmp_path / "arv_db_x.json"
        p.write_text("{}")
        assert cli.resolve_data_file("arv_db_x.json", str(tmp_path)) == str(p)

    def test_finds_in_subdir(self, tmp_path):
        sub = tmp_path / "data_generate"
        sub.mkdir()
        p = sub / "arv_db_y.json"
        p.write_text("{}")
        assert cli.resolve_data_file("arv_db_y.json", str(tmp_path)) == str(p)

    def test_absolute_path_passthrough(self, tmp_path):
        p = tmp_path / "z.json"
        p.write_text("{}")
        assert cli.resolve_data_file(str(p), "/nonexistent") == str(p)

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            cli.resolve_data_file("arv_db_never_exists_xyz.json", str(tmp_path))


class TestConfigRoundtrip:
    def test_json_roundtrip(self):
        from vqwild_tpu.core.config import ExperimentConfig

        cfg, _ = cli.parse(["--method", "va", "--batch_size", "4"])
        restored = ExperimentConfig.from_json(cfg.to_json())
        assert restored == cfg


class TestCacheTag:
    """Feature caches must be keyed by checkpoint AND extraction mode:
    --evaluate forces read_cache_feat, so a float-then-int8 evaluation of
    the same checkpoint would otherwise silently report the float trunk's
    metrics from cache."""

    def _tag(self, args, tmp_path, ckpt):
        cfg, extra = cli.parse(args + ["--test_load", ckpt])
        return cli._ckpt_cache_tag(
            extra["test_load"], cfg.eval.fake_features,
            mode=cli._extraction_mode_tag(cfg),
        )

    def test_same_checkpoint_same_mode_shares_cache(self, tmp_path):
        ckpt = str(tmp_path / "best.pth.tar")
        open(ckpt, "wb").write(b"x")
        assert self._tag(["--evaluate"], tmp_path, ckpt) == self._tag(
            ["--evaluate"], tmp_path, ckpt
        )

    def test_int8_does_not_reuse_float_cache(self, tmp_path):
        ckpt = str(tmp_path / "best.pth.tar")
        open(ckpt, "wb").write(b"x")
        float_tag = self._tag(
            ["--evaluate", "--wire", "yuv420"], tmp_path, ckpt
        )
        int8_tag = self._tag(
            ["--evaluate", "--wire", "yuv420", "--trunk_int8"], tmp_path, ckpt
        )
        assert float_tag != int8_tag

    def test_wire_and_dtype_key_the_cache(self, tmp_path):
        ckpt = str(tmp_path / "best.pth.tar")
        open(ckpt, "wb").write(b"x")
        tags = {
            self._tag(["--evaluate", "--wire", w] + d, tmp_path, ckpt)
            for w, d in [
                ("rgb", []),
                ("yuv420", []),
                ("rgb", ["--compute_dtype", "bfloat16"]),
            ]
        }
        assert len(tags) == 3

    def test_eval_geometry_keys_the_cache(self, tmp_path):
        """Cached features/galleries also depend on the eval geometry:
        frames per chunk, crop size, clip window seconds, temporal stride.
        A pooled gallery built at --temporal_stride 1 must not satisfy the
        forced cache read of a --temporal_stride 2 run of the same ckpt."""
        ckpt = str(tmp_path / "best.pth.tar")
        open(ckpt, "wb").write(b"x")
        base = ["--evaluate"]
        tags = {
            self._tag(base + extra, tmp_path, ckpt)
            for extra in [
                [],
                ["--temporal_stride", "2"],
                ["--clip_sec", "5"],
                ["--test_frame", "16"],
                ["--input_size", "64"],
            ]
        }
        assert len(tags) == 5

    def test_different_checkpoints_never_share(self, tmp_path):
        a, b = str(tmp_path / "a.pth.tar"), str(tmp_path / "b.pth.tar")
        open(a, "wb").write(b"x")
        open(b, "wb").write(b"y" * 2)
        assert self._tag(["--evaluate"], tmp_path, a) != self._tag(
            ["--evaluate"], tmp_path, b
        )

    def test_fake_features_cache_keyed_by_mode(self, tmp_path):
        """Fake features skip the model but NOT the windowing: their cached
        galleries still depend on the geometry and dataset, so the fake tag
        carries the mode suffix too."""
        cfg, extra = cli.parse(["--evaluate", "--memory_leak_debug"])
        tag = cli._ckpt_cache_tag(
            "", cfg.eval.fake_features, mode=cli._extraction_mode_tag(cfg)
        )
        assert tag.startswith("fake-")
        cfg2, _ = cli.parse(
            ["--evaluate", "--memory_leak_debug", "--temporal_stride", "2"]
        )
        tag2 = cli._ckpt_cache_tag(
            "", cfg2.eval.fake_features, mode=cli._extraction_mode_tag(cfg2)
        )
        assert tag2 != tag

    def test_dataset_identity_keys_the_cache(self, tmp_path):
        """run_name() is only method+novel+mv, so two worlds/splits can
        share a run_dir — the cache tag must separate them."""
        ckpt = str(tmp_path / "best.pth.tar")
        open(ckpt, "wb").write(b"x")
        base = ["--evaluate"]
        tags = {
            self._tag(base + extra, tmp_path, ckpt)
            for extra in [
                [],
                ["--meta_split", "120_20_60"],
                ["--frame_store", "synthetic"],
                ["--data_root", str(tmp_path / "other_world")],
            ]
        }
        assert len(tags) == 4


class TestOptimizerAndPretrainedFlags:
    def test_parse_optimizer_flags(self):
        cfg, _ = cli.parse(["--optimizer", "sgd", "--momentum", "0.8",
                            "--temporal_stride", "2"])
        assert cfg.train.optimizer == "sgd"
        assert cfg.train.momentum == 0.8
        assert cfg.eval.temporal_stride == 2

    def test_parse_defaults_match_reference(self):
        cfg, _ = cli.parse([])
        assert cfg.train.optimizer == "adam"  # main.py default
        assert cfg.train.momentum == 0.9  # main.py:140
        assert cfg.eval.temporal_stride == 1  # main.py:49
        assert cfg.train.pretrained_weights == ""

    def test_pretrained_weights_inflate_into_trunk(self, tiny_arv, tmp_path):
        """--pretrained_weights loads a torchvision 2D resnet18 state dict
        and inflates it into the trunk at init (main.py:206-211)."""
        torch = pytest.importorskip("torch")
        from tests.fixtures import fake_resnet18_2d_state_dict

        sd = fake_resnet18_2d_state_dict(seed=3)
        pth = str(tmp_path / "imagenet2d.pth")
        torch.save(sd, pth)
        base = ["--frame_store", "synthetic", "--data_root", tiny_arv["root"],
                "--input_size", "32", "--train_frame", "2", "--test_frame", "2",
                "--batch_size", "2", "--test_batch_size", "4", "--workers", "0"]
        cfg, _ = cli.parse(["--method", "baseline",
                            "--pretrained_weights", pth, *base])
        _, _, _, _, params, state_vars, _, _ = cli.build_stack(cfg)
        import numpy as np

        got = np.asarray(params["trunk"]["conv1"]["kernel"])
        want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_allclose(got, want, atol=0)
        got_var = np.asarray(state_vars["batch_stats"]["trunk"]["bn1"]["var"])
        np.testing.assert_allclose(got_var, sd["bn1.running_var"].numpy(), atol=0)
        # fc is NOT inflated (inflation skips the 1000-way ImageNet fc)
        cfg0 = cli.parse(["--method", "baseline", *base])[0]
        _, _, _, _, params0, _, _, _ = cli.build_stack(cfg0)
        np.testing.assert_allclose(
            np.asarray(params["fc"]["kernel"]),
            np.asarray(params0["fc"]["kernel"]), atol=0)
