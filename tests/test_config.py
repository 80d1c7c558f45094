"""Config derivation rules — parity with reference src/main.cpp:21-90."""

import pytest

from tpufg.config import ConfigError, EngineConfig, resolve_sizes


def test_defaults_match_reference():
    # main.cpp:24-26
    cfg = EngineConfig()
    assert cfg.target_fps == 60
    assert cfg.enable_interpolation is True
    assert cfg.interpolation_factor == 0.5
    # hardcoded kernel constants (scale.comp:14, frame_manager.cpp:332-333)
    assert cfg.lanczos_a == 3
    assert cfg.block_size == 8
    assert cfg.search_radius == 16
    assert cfg.fps_window == 60


def test_input_autodetect():
    # main.cpp:67-74: zero input size is filled from the source
    cfg = resolve_sizes(EngineConfig(), detected_input=(1280, 720))
    assert (cfg.input_width, cfg.input_height) == (1280, 720)
    # neither output dim given -> output = input (main.cpp:86-89)
    assert (cfg.output_width, cfg.output_height) == (1280, 720)


def test_autodetect_required_when_missing():
    with pytest.raises(ConfigError):
        resolve_sizes(EngineConfig())


def test_aspect_completion_from_width():
    # main.cpp:82-85: height = input_height * (output_width / input_width)
    cfg = resolve_sizes(
        EngineConfig(input_width=1280, input_height=720, output_width=2560)
    )
    assert cfg.output_height == 1440


def test_aspect_completion_from_height():
    # main.cpp:78-81
    cfg = resolve_sizes(
        EngineConfig(input_width=1280, input_height=720, output_height=1440)
    )
    assert cfg.output_width == 2560


def test_aspect_completion_truncates_like_reference():
    # the reference casts the float product to uint32 (truncation)
    cfg = resolve_sizes(
        EngineConfig(input_width=1279, input_height=720, output_height=1080)
    )
    assert cfg.output_width == int(1279 * (1080.0 / 720.0))


def test_explicit_sizes_pass_through():
    cfg = resolve_sizes(
        EngineConfig(
            input_width=1920, input_height=1080,
            output_width=3840, output_height=2160,
        )
    )
    assert (cfg.output_width, cfg.output_height) == (3840, 2160)


def test_invalid_factor_rejected():
    with pytest.raises(ConfigError):
        EngineConfig(interpolation_factor=1.5).validate()


def test_invalid_fps_rejected():
    with pytest.raises(ConfigError):
        EngineConfig(target_fps=0).validate()


def test_warp_envelope_validated_at_config_time():
    """A --search-radius / --interpolation-factor combination whose warp
    reach exceeds the kernel window fails in validate() with a message
    naming the flags, not at trace time inside warp_blend_matmul."""
    with pytest.raises(ConfigError, match="search-radius"):
        EngineConfig(motion_mode="exhaustive", search_radius=80,
                     interpolation_factor=0.9).validate()
    # same radius at a kinder blend weight stays valid
    EngineConfig(motion_mode="exhaustive", search_radius=80,
                 interpolation_factor=0.5).validate()
    # non-warping modes don't care
    EngineConfig(motion_mode="none", search_radius=500).validate()
