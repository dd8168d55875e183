"""Analysis pipelines (reference analysis/: neutral-indel conservation,
constraint turnover, synteny rates, contiguous regions).

The reference shells out to BedTools (sortBed/mergeBed/intersectBed/
subtractBed — analysis/neutralIndel/turnoverRate.py:52-69); here the interval
algebra is vectorized numpy (`hal_tpu.analysis.intervals`) so the pipelines
are self-contained and array-native.
"""
