# fce_yolo_tpu build + test entry points.
#
# `make ci` is the full gate (reference .github/workflows/ci.yml analog):
# fast tier + slow tier (every @pytest.mark.slow, incl. the concrete
# reference-YAML build sweep) + torch-reference parity tier. Nothing skips
# silently — the slow tier re-runs everything with --slow so the 70+
# default-skipped tests are exercised.

PY ?= python

.PHONY: test ci slow parity native lint bench

test:
	$(PY) -m pytest tests/ -q

slow:
	$(PY) -m pytest tests/ -q --slow

parity:
	$(PY) -m pytest tests/test_parity_torch.py tests/test_e2e_map_parity.py -q --slow

native:
	g++ -O2 -std=c++17 -o native/infer/fy_infer native/infer/fy_infer.cpp
	cmake -B native/build native -G Ninja && ninja -C native/build

ci: native slow

bench:
	$(PY) bench.py
