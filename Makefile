# Developer workflow entry points. The contract these encode (SCALE.md
# "verification recipe"): NO catalog-plan change lands without a
# gate-replica pass at BOTH sf0.01 and sf0.1.

SF001 := /root/testdata/sf0.01
SF01  := /root/testdata/sf0.1

.PHONY: test sweep sweep01 sweep-only bench parity-extended audit probe

test:
	python -m pytest tests/ -x -q

# full driver-gate replica (hostile tz default) at both grading scales
sweep:
	python scripts/full_sweep.py $(SF001)
	python scripts/full_sweep.py $(SF01)

sweep01:
	python scripts/full_sweep.py $(SF01)

# fast targeted re-check after touching specific queries:
#   make sweep-only Q=a14_rfm_segments,a19_pareto_value_share
# unknown names hard-error (exit 2) — a typo cannot shrink the sweep
sweep-only:
	python scripts/full_sweep.py $(SF001) --only $(Q)
	python scripts/full_sweep.py $(SF01) --only $(Q)

# the catalog entries the external driver has never hashed (their only
# regression gate until a driver round samples them)
parity-extended:
	python -m pytest tests/test_oracle_parity.py -m parity_extended -q

bench:
	python bench.py

# per-query source-scan count audit (flags any query reading a source >= 3x)
audit:
	python scripts/plan_scan_audit.py

# growth-curve scale probes (writes scale_probe_results.json; quiet
# host required — concurrent Spark jobs poison the medians)
probe:
	python scripts/probe_round10b.py
