"""Config subsystem tests: HOCON parsing + dataclass mapping.

The acid test is that the repo's ``confs/vf_nerf.conf`` (same surface as the
reference's) parses to the reference's documented values
(reference ``confs/vf_nerf.conf:1-121``).
"""

import os

import pytest

from vf_nerf_tpu.config import hocon, parse_config

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONF = os.path.join(REPO_ROOT, "confs", "vf_nerf.conf")


class TestHocon:
    def test_scalars(self):
        conf = hocon.parse_string("""
            a = 1
            b = 2.5
            c = -3e-4
            d = True
            e = false
            f = "hello"
            g = bare_word
        """)
        assert conf == {"a": 1, "b": 2.5, "c": -3e-4, "d": True, "e": False,
                        "f": "hello", "g": "bare_word"}
        assert isinstance(conf["a"], int)

    def test_nested_and_lists(self):
        conf = hocon.parse_string("""
            outer {
                inner { x = 1, y = [1, 2, 3], }
                z = [1e-4, 1e9],
            }
        """)
        assert conf["outer"]["inner"] == {"x": 1, "y": [1, 2, 3]}
        assert conf["outer"]["z"] == [1e-4, 1e9]

    def test_inline_comments(self):
        conf = hocon.parse_string('name = "replica" # scannet\nn = 5 // five')
        assert conf == {"name": "replica", "n": 5}

    def test_trailing_commas_and_colon(self):
        conf = hocon.parse_string("a: 1\nb = 2,\nc { d = 3, }")
        assert conf == {"a": 1, "b": 2, "c": {"d": 3}}

    def test_duplicate_object_merge(self):
        conf = hocon.parse_string("a { x = 1 }\na { y = 2 }")
        assert conf["a"] == {"x": 1, "y": 2}

    def test_errors(self):
        with pytest.raises(hocon.HoconParseError):
            hocon.parse_string("a = [1, 2")
        with pytest.raises(hocon.HoconParseError):
            hocon.parse_string('a = "unterminated')


class TestParseConfig:
    def test_reference_conf_values(self):
        cfg = parse_config(scene="office0", config_path=CONF,
                           expname="replica", data_root_dir="data")
        # expname mangling (reference vf_nerf_config_parser.py:104)
        assert cfg.expname == "replica_office0"
        # density (reference confs/vf_nerf.conf:1-11)
        d = cfg.vf_nerf_config.density_config
        assert d.params_init == {"beta": 0.5, "scale": 100.0, "mean": 0.7}
        assert d.beta_bounds == [1e-4, 1e9]
        assert d.mean_bounds == [0.6, 1.0]
        assert d.cutoff == -2.0
        # vf net (conf:13-26)
        v = cfg.vf_nerf_config.vf_net_config
        assert v.dimensions == [256] * 8
        assert v.embedder_multires == 6
        assert v.skip_connection_in == [4]
        assert v.batch_norm and not v.weight_norm and not v.dropout
        # rendering net (conf:28-37)
        r = cfg.vf_nerf_config.rendering_net_config
        assert r.mode == "idr" and r.detach_normals
        assert r.dimensions == [256] * 4 and r.embedder_multires == 4
        # ray sampler (conf:39-49)
        s = cfg.vf_nerf_config.ray_sampler_config
        assert (s.n_samples, s.n_importance, s.max_samples) == (100, 30, 100)
        assert s.fine_sampling()
        assert s.fine_range == 0.3 and s.increase_every == 50
        # scheduler (conf:51-56)
        assert cfg.vf_nerf_config.scheduler_config.lr == 5e-4
        assert cfg.vf_nerf_config.scheduler_config.clip_norm == 0.5
        # vf_nerf block (conf:64-75)
        n = cfg.vf_nerf_config
        assert n.rendering == "volsdf" and n.normalize_rendering
        assert n.dir_to_normal_th == -2
        assert len(n.cos_sim_weights) == 11
        assert n.cos_sim_weights_anneal == "hard"
        assert (n.anneal_start, n.anneal_end) == (700, 1400)
        # loss (conf:77-91)
        assert cfg.vf_loss_weights.rgb == 2.0
        assert cfg.vf_loss_weights.directional_derivatives == 0.0
        assert cfg.vf_loss_config.depth_loss_clamp == 0.5
        assert cfg.vf_loss_config.norm_smaller_than_one_start == 11000
        # dataset (conf:94-101)
        assert cfg.dataset_config.dataset_name == "replica"
        assert cfg.dataset_config.pixels_per_batch == 1024
        assert cfg.dataset_config.scene == "office0"
        # train (conf:115-121)
        assert cfg.num_epochs == 3001 and cfg.save_frequency == 100

    def test_cos_sim_weights_dict(self):
        cfg = parse_config(scene="office0", config_path=CONF)
        wd = cfg.vf_nerf_config.cos_sim_weights_dict()
        assert set(wd) == {f"w_{i}" for i in range(11)}
        assert wd["w_0"] == pytest.approx(0.09)

    def test_device_section_does_not_collide_with_cli(self, tmp_path):
        """A conf [device] section setting platform/num_devices used to
        TypeError against the CLI kwargs; CLI wins when given, conf
        otherwise (advisor r2)."""
        import shutil

        conf_path = str(tmp_path / "with_device.conf")
        shutil.copy(CONF, conf_path)
        with open(conf_path, "a") as f:
            f.write('\ndevice { platform = "cpu", num_devices = 4, '
                    'steps_per_dispatch = 2 }\n')
        cfg = parse_config(scene="office0", config_path=conf_path)
        dev = cfg.vf_nerf_config.device_config
        assert dev.platform == "cpu" and dev.num_devices == 4
        assert dev.steps_per_dispatch == 2
        cfg2 = parse_config(scene="office0", config_path=conf_path,
                            gpu="tpu", num_devices=2)
        dev2 = cfg2.vf_nerf_config.device_config
        assert dev2.platform == "tpu" and dev2.num_devices == 2

    def test_invalid_anneal_mode_rejected(self):
        from vf_nerf_tpu.config.schema import VFNerfConfig
        cfg = parse_config(scene="x", config_path=CONF)
        import dataclasses
        with pytest.raises(ValueError):
            dataclasses.replace(cfg.vf_nerf_config,
                                cos_sim_weights_anneal="bogus")
