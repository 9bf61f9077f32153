"""Fold the round-5 tuned-baseline sweep into the committed head-to-head.

Reads results/fuel2008_sweep/report.json (the trimmed one-config-per-lever
sweep, run_fuel2008_sweep3.py) and rewrites the advantage section of
results/fuel_headtohead/report.json so the committed claim is against the
2008 baseline at its best setting, not its untuned default (VERDICT r4 #5).
"""

import json

HH = "results/fuel_headtohead/report.json"
SW = "results/fuel2008_sweep/report.json"

hh = json.load(open(HH))
sw = json.load(open(SW))

best = sw["best_full_protocol"]
hh["linear_2008_tuned_r5"] = {
    "sweep": "one config per lever class (damping / recon grid / hermite / "
             "recorded-true paths / reference 180-deg geometry), best "
             "re-run at the full 2.1M-ray protocol — "
             "results/fuel2008_sweep/sweep.jsonl",
    "best_cfg": best["cfg"],
    "rel_norm": best["rel_norm"],
    "lever_summary": {
        r["name"]: round(r["rel_norm"], 4)
        for r in sw["rows"] if "rel_norm" in r
    },
}
adv65 = best["rel_norm"] / hh["nonlinear_adjoint"]["rel_norm_65"]
adv129 = best["rel_norm"] / hh["nonlinear_adjoint"]["rel_norm_129"]
hh["advantage"] = {
    "adjoint_vs_untuned_2008_at_matched_res_65": 14.506,
    "adjoint_vs_tuned_2008_at_matched_res_65": round(adv65, 3),
    "adjoint_vs_tuned_2008_at_129": round(adv129, 3),
    "claim": "the 2008 linear baseline is only competitive at all when "
             "reconstructing a coarse grid (the conditioning lever; "
             "rel_norm {:.2f} at its best vs 3.90 untuned at 64^3); the "
             "nonlinear adjoint at full 129^3 resolution still has "
             "{:.1f}x lower error than the tuned baseline's best".format(
                 best["rel_norm"], adv129),
}
json.dump(hh, open(HH, "w"), indent=1)
print(json.dumps(hh["advantage"], indent=1))
