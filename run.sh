#!/bin/bash
# PMoE-TPU CLI dispatcher — the same stage surface as the reference run.sh
# (/root/reference/run.sh:29-60), minus the CARLA PYTHONPATH plumbing (the
# simulator seam is selected per-config via env.backend / --backend).
export PYTHONPATH="$(dirname "$(readlink -f "$0")"):${PYTHONPATH}"
# persistent XLA compile cache: tunneled-TPU compiles cost minutes; repeats hit disk
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/pmoe_tpu_xla}"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS="${JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS:-1}"

help() {
  echo "Usage: $0 COMMAND [args]"
  echo ""
  echo "Commands:"
  echo "  stage0                 train the segmentation U-Net (conf/stage_0)"
  echo "  stage1                 train the predictive U-Net (conf/stage_1)"
  echo "  stage2 CONF            train an action model (e.g. pmoe_tpu/conf/stage_2_moe)"
  echo "  stage3                 DDPG fine-tuning in the driving env (conf/stage_3)"
  echo "  benchmark              run the leaderboard routes benchmark"
  echo "  nocrash TOWN WEATHER   run the NoCrash benchmark (Town01|Town02, train|test)"
  echo "  view_benchmark [DIR]   print benchmark results tables"
  echo "  collect [args]         collect training episodes (noisy expert)"
  echo "  scenario [args]        run one scenario class standalone (srunner CLI analog)"
  echo "                         (--openscenario FILE.xosc runs an OpenSCENARIO doc;"
  echo "                          --record OUT.json saves a recording for 'metrics')"
  echo "  metrics [args]         run a metric class over a recording (metrics_manager analog)"
  echo "  pretty_print -f JSON   print a leaderboard results JSON as tables (scripts/pretty_print_json analog)"
  echo "  scenario_lint -f JSON  validate trigger annotations vs the route library (scripts/set_new_scenarios analog)"
  echo "  bench                  run the perf benchmark (bench.py)"
  echo "  -h | --help            show this help"
}

case "$1" in
  stage0)          python -m pmoe_tpu.trainer.train_0 "${2:-pmoe_tpu/conf/stage_0}" ;;
  stage1)          python -m pmoe_tpu.trainer.train_1 "${2:-pmoe_tpu/conf/stage_1}" ;;
  stage2)          shift; python -m pmoe_tpu.trainer.train_2 "$@" ;;
  stage3)          python -m pmoe_tpu.trainer.train_3 "${2:-pmoe_tpu/conf/stage_3}" ;;
  benchmark)       shift; python -m pmoe_tpu.eval.evaluate "$@" ;;
  nocrash)         shift; python -m pmoe_tpu.eval.evaluate_nocrash --town "${1:-Town01}" --weather "${2:-train}" "${@:3}" ;;
  view_benchmark)  shift; python -m pmoe_tpu.eval.view_results "$@" ;;
  collect)         shift; python -m pmoe_tpu.agents.collect "$@" ;;
  scenario)        shift; python -m pmoe_tpu.eval.scenario_cli "$@" ;;
  metrics)         shift; python -m pmoe_tpu.eval.metrics_manager "$@" ;;
  pretty_print)    shift; python -m pmoe_tpu.eval.pretty_print "$@" ;;
  scenario_lint)   shift; python -m pmoe_tpu.eval.scenario_lint "$@" ;;
  bench)           python bench.py ;;
  -h|--help|*)     help ;;
esac
