"""Command-line interface.

Mirrors the reference binary's flag surface exactly (src/main.cpp:8-19
PrintUsage; parsing main.cpp:28-54) and replaces the X11 ``window-id``
positional with an INPUT spec (file / y4m / synthetic / stdin), since a TPU
host has no display server.  Reference semantics preserved:

- defaults: --target-fps 60, interpolation on, --interpolation-factor 0.5
- input size auto-detected from the source when not given (main.cpp:67-74)
- missing output dimension completed by aspect ratio (main.cpp:76-90)
- missing INPUT -> usage + exit 1 (main.cpp:57-60)

TPU-build additions: --output sink spec, --frames limit, --no-pacing,
--motion-mode, --precision, --dtype, and the reference's hardcoded kernel
constants exposed (--lanczos-a, --block-size, --search-radius).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional

from tpufg.config import ConfigError, EngineConfig, resolve_sizes
from tpufg.utils.logging import get_logger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpufg",
        description="TPU-native real-time upscaling and motion-compensated "
                    "frame interpolation",
        add_help=False,
    )
    p.add_argument("--help", action="help",
                   help="Show this help message")
    p.add_argument("input", nargs="?", metavar="INPUT",
                   help="input spec: raw RGBA file, *.y4m, compressed video "
                        "(*.mp4/*.avi/*.mkv/... or video:path, decoded via "
                        "OpenCV), synthetic:WxH, '-' for stdin, or "
                        "follow:path[:idle_s] to tail a growing file "
                        "(live ingest)")
    p.add_argument("--input-width", type=int, default=0, metavar="WIDTH",
                   help="Input width (default: auto-detect)")
    p.add_argument("--input-height", type=int, default=0, metavar="HEIGHT",
                   help="Input height (default: auto-detect)")
    p.add_argument("--output-width", type=int, default=0, metavar="WIDTH",
                   help="Output width")
    p.add_argument("--output-height", type=int, default=0, metavar="HEIGHT",
                   help="Output height")
    p.add_argument("--target-fps", type=int, default=None, metavar="FPS",
                   help="Target FPS (default: source metadata, else 60 — "
                        "the same auto-detect spirit as input size)")
    p.add_argument("--no-interpolation", action="store_true",
                   help="Disable frame interpolation")
    p.add_argument("--interpolation-factor", type=float, default=0.5,
                   metavar="F",
                   help="Interpolation blend factor (0.0-1.0, default: 0.5)")
    # TPU-build surface
    p.add_argument("--output", default=None, metavar="SINK",
                   help="output: raw file, *.y4m, *.mp4/*.avi (OpenCV "
                        "encode), dir/ (PNGs), 'null' (default: null)")
    p.add_argument("--y4m-chroma", choices=["444", "420"], default="444",
                   help="y4m output chroma: 444 (lossless) or 420 "
                        "(half the file size)")
    p.add_argument("--frames", type=int, default=None, metavar="N",
                   help="stop after N input frames")
    p.add_argument("--start-frame", type=int, default=0, metavar="N",
                   help="skip the first N input frames (resume an offline "
                        "transcode)")
    p.add_argument("--fps-multiplier", type=int, default=2, metavar="K",
                   help="emit K-1 in-between frames per input pair "
                        "(default 2 = fps doubling; 4 = 30->120)")
    p.add_argument("--no-pacing", action="store_true",
                   help="run unpaced (benchmark mode)")
    p.add_argument("--devices", type=int, default=0, metavar="N",
                   help="multi-chip offline transcode over N devices "
                        "(frame rows sharded with ICI halo exchange; "
                        "default: single-chip streaming)")
    p.add_argument("--dp", type=int, default=1, metavar="D",
                   help="with --devices: batch D consecutive frame pairs "
                        "over a data-parallel mesh axis (N/D spatial "
                        "shards each)")
    p.add_argument("--model-path", default=None, metavar="CKPT",
                   help="learned-head checkpoint (.npz) for "
                        "--motion-mode learned")
    p.add_argument("--overlay", action="store_true",
                   help="burn the FPS/Input/Output stats line into output "
                        "frames (reference scaler overlay)")
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="capture a jax.profiler trace into DIR")
    p.add_argument("--debug-checks", action="store_true",
                   help="enable NaN/Inf guards on every computation "
                        "(debug builds' validation-layer analog)")
    p.add_argument("--motion-mode", choices=["pyramid", "exhaustive", "none", "learned"],
                   default="pyramid", help="motion estimation strategy")
    p.add_argument("--precision", choices=["fast", "exact"], default="fast",
                   help="fast = Pallas kernels; exact = f32 oracle "
                        "(bit-exact GLSL spec)")
    p.add_argument("--dtype", choices=["bf16", "f32"], default="bf16",
                   help="compute dtype for the fast path")
    p.add_argument("--channel-order", choices=["rgba", "bgra"],
                   default="rgba", help="raw input channel order")
    # reference hardcoded constants, promoted (scale.comp:14,
    # frame_manager.cpp:332-333)
    p.add_argument("--lanczos-a", type=int, default=3)
    p.add_argument("--block-size", type=int, default=8)
    p.add_argument("--search-radius", type=int, default=16)
    p.add_argument("--mv-grid", type=int, choices=[16, 8, 1], default=16,
                   help="warp granularity: 16-px MV blocks, 8 (bilinearly "
                        "upsampled MV field), or 1 (per-pixel: bilinearly "
                        "blended block warps — smoothest motion "
                        "boundaries, ~2x warp cost)")
    p.add_argument("--subpel", action="store_true",
                   help="sub-pixel MV refinement: full-res ±1 px re-search "
                        "+ parabolic fit (codec-style half-pel; best "
                        "combined with --mv-grid 1)")
    p.add_argument("--mv-bias", type=float, default=0.0, metavar="B",
                   help="search-cost bias toward small displacements "
                        "(codec zero/predictor preference; ~0.1 stabilizes "
                        "the aperture problem on low-texture motion; "
                        "0 = off, bitwise-parity scan)")
    p.add_argument("--mv-filter", action="store_true",
                   help="3x3 median filter on the MV field (kills isolated "
                        "outlier vectors)")
    p.add_argument("--occlusion-blend", action="store_true",
                   help="shift the blend toward the temporally closer frame "
                        "where warped sources disagree (suppresses "
                        "double-exposure ghosts at occlusions)")
    p.add_argument("--mc-fallback", action="store_true",
                   help="adaptive fallback to a plain crossfade per 8x8 "
                        "cell wherever motion compensation does not reduce "
                        "photometric disagreement vs zero motion (wrong "
                        "motion degrades to blur instead of ghosting)")
    p.add_argument("--scene-cut", type=float, default=0.0, metavar="T",
                   help="scene-cut fallback: when mean |prev-curr| (0..1 "
                        "units) exceeds T, in-between frames repeat the "
                        "nearer source instead of interpolating across the "
                        "cut (0 disables; ~0.1 is typical)")
    p.add_argument("--quality", nargs="?", const="on",
                   choices=["on", "auto"], default=None, metavar="MODE",
                   help="best-quality interpolation preset (= --mv-grid 1 "
                        "--subpel --mv-bias 0.1 --mv-filter --mc-fallback; "
                        "explicit flags win).  "
                        "'auto' measures the preset's step rate "
                        "first and keeps it only when it sustains 1.5x the "
                        "target input rate, else falls back to the latency "
                        "defaults")
    p.add_argument("--preview", default=None, metavar="[HOST:]PORT",
                   help="serve a live preview of the output at "
                        "http://HOST:PORT/ (any browser is the display — "
                        "the reference's SDL window, src/scaler.cpp:538-609,"
                        " re-hosted for a headless TPU node).  Default "
                        "host 127.0.0.1; composes with any --output")
    p.add_argument("--temporal-mv", action="store_true",
                   help="seed each pair's motion search with the previous "
                        "pair's MV field (codec-style temporal predictor): "
                        "tracks sustained motion far beyond the per-pair "
                        "search range, at wider-warp cost.  Pyramid mode; "
                        "with --devices it needs --dp 1 (the predictor is "
                        "per-stream sequential state threaded between "
                        "pairs — row-sharded and halo-exchanged like "
                        "frames, but incompatible with dp's batched pair "
                        "parallelism)")
    return p


def main(argv: Optional[list[str]] = None) -> int:
    log = get_logger()
    parser = build_parser()
    args = parser.parse_args(argv)

    # stdout carries the y4m payload when --output is '-': log lines
    # would corrupt the stream, so route them to stderr for that run
    # (set explicitly each invocation; resolved at write time)
    log.to_stderr = args.output == "-"

    if not args.input:
        # main.cpp:57-60: missing positional -> error + usage + exit 1
        log.error("No input specified")
        parser.print_help()
        return 1

    cfg = EngineConfig(
        input_width=args.input_width,
        input_height=args.input_height,
        output_width=args.output_width,
        output_height=args.output_height,
        target_fps=args.target_fps if args.target_fps is not None else 60,
        enable_interpolation=not args.no_interpolation,
        interpolation_factor=args.interpolation_factor,
        lanczos_a=args.lanczos_a,
        block_size=args.block_size,
        search_radius=args.search_radius,
        dtype=args.dtype,
        motion_mode=args.motion_mode,
        overlay=args.overlay,
        fps_multiplier=args.fps_multiplier,
        mv_grid=args.mv_grid,
        subpel=args.subpel,
        mv_bias=args.mv_bias,
        mv_filter=args.mv_filter,
        occlusion_blend=args.occlusion_blend,
        mc_fallback=args.mc_fallback,
        scene_cut_threshold=args.scene_cut,
        temporal_mv=args.temporal_mv,
    )

    from tpufg.io.sinks import open_sink
    from tpufg.io.sources import SourceError, open_source

    try:
        cfg.validate()
        source = open_source(args.input, args.input_width, args.input_height,
                             args.channel_order,
                             frames=args.frames or 300)
    except (ConfigError, SourceError, OSError) as e:
        log.error(str(e))
        return 1

    # rate auto-detect: like the reference's input-size auto-detect
    # (main.cpp:67-74), an unspecified --target-fps takes the source's
    # frame rate when the container reports one (y4m F tag)
    if args.target_fps is None and source.fps:
        cfg.target_fps = max(1, int(round(source.fps)))

    try:
        cfg = resolve_sizes(cfg, detected_input=source.size)
    except ConfigError as e:
        log.error(str(e))
        source.close()
        return 1

    if (args.quality and cfg.enable_interpolation
            and cfg.motion_mode in ("pyramid", "exhaustive")):
        from tpufg.config import apply_quality_preset
        user_set = frozenset(
            n for n in ("mv_grid", "mv_bias")
            if getattr(args, n) != parser.get_default(n))
        try:
            qcfg = apply_quality_preset(cfg, user_set).validate()
        except ConfigError as e:
            log.error(str(e))
            source.close()
            return 1
        if args.quality == "auto":
            # headroom check: keep the preset only when its measured step
            # rate sustains 1.5x the target input rate (compiles + times
            # the preset step once; a rejected preset costs that compile)
            from tpufg.engine.runner import measure_step_rate
            try:
                rate = measure_step_rate(qcfg)
            except (ValueError, RuntimeError) as e:
                log.error(str(e))
                source.close()
                return 1
            need = 1.5 * cfg.target_fps
            if rate >= need:
                log.info(f"--quality auto: preset sustains {rate:.1f} "
                         f"pairs/s >= 1.5x target {cfg.target_fps} — "
                         "quality preset on")
                cfg = qcfg
            else:
                log.info(f"--quality auto: preset rate {rate:.1f} pairs/s "
                         f"< {need:.1f} — keeping the latency defaults")
        else:
            cfg = qcfg

    log.info(f"Input: {cfg.input_width}x{cfg.input_height}  Output: "
             f"{cfg.output_width}x{cfg.output_height}  fps: {cfg.target_fps}"
             f"  interpolation: {'on' if cfg.enable_interpolation else 'off'}")

    out_fps = cfg.target_fps * (cfg.fps_multiplier
                                if cfg.enable_interpolation else 1)
    try:
        sink = open_sink(args.output, cfg.output_width, cfg.output_height,
                         fps=float(out_fps), y4m_chroma=args.y4m_chroma)
    except (ValueError, OSError) as e:
        log.error(str(e))
        source.close()
        return 1
    if args.preview:
        from tpufg.io.preview import PreviewSink, TeeSink, parse_preview_spec
        try:
            host, port = parse_preview_spec(args.preview)
            preview = PreviewSink(port, host)
        except (ValueError, OSError) as e:
            log.error(f"--preview: {e}")
            sink.close()
            source.close()
            return 1
        log.info(f"live preview at {preview.url}")
        sink = TeeSink(sink, preview)
    if sink.needs_host:
        # serialize frames on a worker thread so egress (pixel conversion
        # + file IO) overlaps the next step's device compute — the sink
        # side of the ingest ring's software pipeline
        from tpufg.io.sinks import AsyncSink
        sink = AsyncSink(sink)

    from tpufg.engine.runner import run_stream

    model_params = None
    if args.motion_mode == "learned":
        path = args.model_path
        if not path:
            # fall back to the newest checkpoint shipped with the repo
            from tpufg.models.rife import bundled_checkpoint
            bundled = bundled_checkpoint()
            if bundled:
                path = bundled
                log.info(f"--model-path not given; using bundled {path}")
            else:
                log.error("--motion-mode learned requires --model-path")
                sink.close()
                source.close()
                return 1
        from tpufg.models import rife
        model_params = rife.load_params(path)

    from tpufg.utils.tracing import debug_checks, trace_session

    try:
        with trace_session(args.trace), debug_checks(args.debug_checks):
            if args.devices > 1:
                from tpufg.engine.runner import run_sharded_stream
                if args.precision == "exact":
                    log.error("--devices requires --precision fast "
                              "(the oracle path is single-chip)")
                    return 1
                if not args.no_pacing:
                    log.info("multi-chip transcode is offline: pacing off")
                stats = run_sharded_stream(
                    cfg, source, sink, devices=args.devices, dp=args.dp,
                    max_frames=args.frames, start_frame=args.start_frame,
                    model_params=model_params)
            else:
                stats = run_stream(cfg, source, sink,
                                   precision=args.precision,
                                   max_frames=args.frames,
                                   paced=not args.no_pacing,
                                   model_params=model_params,
                                   start_frame=args.start_frame)
    except KeyboardInterrupt:
        log.info("Interrupted, cleaning up...")
        return 130
    except (ConfigError, ValueError, RuntimeError) as e:
        # RuntimeError covers backend/XLA failures — the analog of the
        # reference's top-level catch(std::exception) (main.cpp:131-134):
        # log and exit cleanly instead of tracebacking
        log.error(str(e))
        return 1
    finally:
        source.close()
        sink.close()

    pacing = (f", deadlines {stats.paced_frames - stats.deadline_misses}"
              f"/{stats.paced_frames} met"
              if stats.paced_frames else "")
    log.info(f"Done: {stats.frames_in} in, {stats.frames_out} out, "
             f"fps {stats.fps:.1f}, "
             f"p99 {stats.latency.get('p99_ms', 0):.2f} ms{pacing}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
