#!/bin/bash
# Unified driver CLI — same subcommand surface as the reference's pano.sh
# (/root/reference/pano.sh:97-130): build | run | perf | eval | help.
# Implementations map to execution configs of the one TPU-native library
# instead of four separate binaries:
#   serial  -> JAX CPU oracle        (reference: serial_stitching)
#   openmp  -> sharded multi-chip    (reference: openmp_stitching)
#   gpu|tpu -> single-accelerator    (reference: gpu_stitching)
#   opencv  -> cv::Stitcher baseline (reference: opencv_impl)

SCRIPT_DIR="$( cd "$( dirname "${BASH_SOURCE[0]}" )" &> /dev/null && pwd )"
PYTHON="${PYTHON:-python3}"

usage() {
    echo "Usage:"
    echo "  $0 build"
    echo "      Verify the environment (imports, JAX backend, native exts)"
    echo ""
    echo "  $0 run <implementation> <image1> <image2> [<image3> ...] [options]"
    echo "      Run an implementation with image files"
    echo "      implementation: serial, openmp (sharded), gpu/tpu, opencv"
    echo ""
    echo "  $0 perf <implementation> <image1> <image2> [<image3> ...] [options]"
    echo "      Run with the JAX profiler; writes <impl>_perf_report.txt and"
    echo "      an xplane trace directory for deep analysis"
    echo ""
    echo "  $0 eval <generated_panorama> <reference_panorama>"
    echo "      Evaluate stitching quality against a reference panorama"
    echo ""
    echo "Options for 'run' and 'perf':"
    echo "  --dir <directory>      Use all images in the specified directory"
    echo "  --out <filename>       Output filename (default: result.jpg)"
    echo ""
    echo "Examples:"
    echo "  $0 run tpu images/mountain/mountain1.jpg images/mountain/mountain2.jpg"
    echo "  $0 run serial --dir images/oilseed/ --out oilseed_panorama.jpg"
    echo "  $0 eval result.jpg images/oilseed-ref.jpg"
    exit 1
}

if [ $# -lt 1 ]; then
    usage
fi

COMMAND=$1
shift

case $COMMAND in
    build)
        echo "=== Building pano_tpu ==="
        cd "$SCRIPT_DIR" || exit 1
        if command -v cmake >/dev/null 2>&1; then
            echo "Building native host library (native/pano_host.cpp)..."
            (cd native && cmake -B build -G Ninja . >/dev/null && \
                cmake --build build >/dev/null) \
                && echo "native: native/build/libpano_host.so" \
                || echo "native build failed (Python fallback will be used)"
        fi
        "$PYTHON" - <<'EOF' || { echo "Build check failed"; exit 1; }
import jax
import pano_tpu
print(f"pano_tpu {pano_tpu.__version__}")
print(f"jax {jax.__version__}, backend: {jax.default_backend()}, "
      f"devices: {len(jax.devices())}")
EOF
        echo "=== Build check completed successfully ==="
        ;;

    run)
        if [ $# -lt 1 ]; then
            echo "Error: Missing implementation"
            usage
        fi
        IMPL=$1
        shift
        echo "Running $IMPL implementation..."
        PYTHONPATH="$SCRIPT_DIR:$PYTHONPATH" "$PYTHON" -m pano_tpu.cli "$IMPL" "$@"
        if [ $? -eq 0 ]; then
            echo "Stitching completed successfully!"
        else
            echo "Stitching failed with error code $?"
        fi
        ;;

    perf)
        if [ $# -lt 1 ]; then
            echo "Error: Missing implementation"
            usage
        fi
        IMPL=$1
        shift
        TRACE_DIR="${SCRIPT_DIR}/${IMPL}_perf_trace"
        echo "Running performance profiling on $IMPL implementation..."
        PYTHONPATH="$SCRIPT_DIR:$PYTHONPATH" PANO_TPU_PROFILE="$TRACE_DIR" \
            "$PYTHON" -m pano_tpu.cli "$IMPL" "$@" | tee "${IMPL}_perf_report.txt"
        if [ ${PIPESTATUS[0]} -eq 0 ]; then
            echo "Performance profiling completed successfully!"
            echo "Performance report saved to ${IMPL}_perf_report.txt"
            echo "Profiler trace (xplane) saved to ${TRACE_DIR}"
        else
            echo "Performance profiling failed with error code $?"
        fi
        ;;

    eval)
        if [ $# -lt 2 ]; then
            echo "Error: Missing panorama images"
            echo "Usage: $0 eval <generated_panorama> <reference_panorama>"
            exit 1
        fi
        GENERATED_PANORAMA=$1
        REFERENCE_PANORAMA=$2
        if [ ! -f "$GENERATED_PANORAMA" ]; then
            echo "Error: Generated panorama file not found: $GENERATED_PANORAMA"
            exit 1
        fi
        if [ ! -f "$REFERENCE_PANORAMA" ]; then
            echo "Error: Reference panorama file not found: $REFERENCE_PANORAMA"
            exit 1
        fi
        echo "Evaluating panorama quality..."
        PYTHONPATH="$SCRIPT_DIR:$PYTHONPATH" "$PYTHON" \
            "$SCRIPT_DIR/evaluate_panorama.py" "$GENERATED_PANORAMA" "$REFERENCE_PANORAMA"
        if [ $? -eq 0 ]; then
            echo "Evaluation completed successfully!"
        else
            echo "Evaluation failed with error code $?"
        fi
        ;;

    help)
        usage
        ;;

    *)
        echo "Unknown command: $COMMAND"
        usage
        ;;
esac
