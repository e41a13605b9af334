"""Recipes layer: every checked-in recipe parses, every run maps to an
existing tool with flags that tool actually accepts, and the published
hyperparameters survive (spot checks against the reference scripts)."""

import glob
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import run_recipe  # noqa: E402

RECIPES = sorted(glob.glob(os.path.join(REPO, "recipes", "*.toml")))


def _tool_flags(tool: str) -> set:
    """Flags accepted by a tools/<tool>.py argparse CLI (source scan — the
    tools import jax at module level, too heavy to exec here)."""
    src = open(os.path.join(REPO, "tools", tool + ".py")).read()
    return set(re.findall(r'add_argument\(\s*"(--\w[\w-]*)"', src))


def test_recipes_exist():
    names = {os.path.basename(p) for p in RECIPES}
    assert {"ant_imagenet_qat.toml", "ant_imagenet_ptq6.toml",
            "ant_bert_glue.toml", "olive_glue.toml", "olive_squad.toml",
            "olive_clm.toml"} <= names


@pytest.mark.parametrize("path", RECIPES, ids=os.path.basename)
def test_recipe_runs_map_to_tool_flags(path):
    doc = run_recipe.load_recipe(path)
    defaults = doc.get("defaults", {})
    names = set()
    for r in doc["run"]:
        assert r.get("name"), f"unnamed run in {path}"
        assert r["name"] not in names, f"duplicate {r['name']}"
        names.add(r["name"])
        merged = {**defaults, **r}
        tool = merged["tool"]
        assert os.path.exists(os.path.join(REPO, "tools", tool + ".py"))
        flags = _tool_flags(tool)
        for key in merged:
            if key in run_recipe.RESERVED:
                continue
            assert "--" + key in flags, (
                f"{path}:{r['name']}: tool {tool} has no flag --{key}")


def test_build_command_shapes():
    cmd = run_recipe.build_command(
        {"name": "x", "model": "resnet18", "train": True, "lr": 5e-5},
        {"tool": "imagenet_qat", "wbit": 4}, ["--limit", "8"])
    s = " ".join(cmd)
    assert s.endswith("--limit 8")
    assert "--wbit 4" in s and "--model resnet18" in s
    assert "--train" in s and "--train true" not in s


def test_published_hyperparameters():
    """Spot-check facts from the reference scripts survive in the recipes."""
    qat = run_recipe.load_recipe(
        os.path.join(REPO, "recipes", "ant_imagenet_qat.toml"))
    by_name = {r["name"]: r for r in qat["run"]}
    assert by_name["vit_ANT4-8"]["layers8"] == "0,2,3,4,7,11,23,25,31,44,49"
    assert by_name["resnet50_ANT4-8"]["layers8"] == "0,53"
    assert by_name["resnet18_IP-F"]["lr"] == 5e-5
    assert by_name["inceptionv3_IP"]["a_low"] == 50

    clm = run_recipe.load_recipe(
        os.path.join(REPO, "recipes", "olive_clm.toml"))
    bs = {r["name"]: r["batch_size"] for r in clm["run"]}
    assert bs["gpt2xl_wikitext"] == 8
    assert bs["opt67b_wikitext"] == 2
    assert bs["bloom7b1_c4"] == 1
    assert clm["defaults"]["w_up"] == 250

    glue = run_recipe.load_recipe(
        os.path.join(REPO, "recipes", "ant_bert_glue.toml"))
    assert glue["defaults"]["w_low"] == 80
    assert glue["defaults"]["lr"] == 2e-5
    # ANT4-8 promotion counts come from eval_{cola,sst2,mnli}.sh: n8 is 10
    # for CoLA, 6 for MNLI, and absent (no promotion) for SST-2.
    gruns = {r["name"]: r for r in glue["run"]}
    assert gruns["cola_ANT4-8"]["n8"] == 10
    assert gruns["mnli_ANT4-8"]["n8"] == 6
    assert "n8" not in gruns["sst2_ANT4-8"]
    # eval scripts run all six columns per task: FIP + FIP-F present.
    for task in ("cola", "sst2", "mnli"):
        assert gruns[f"{task}_FIP"]["mode"] == "ant-int-pot-float"
        assert gruns[f"{task}_FIP-F"]["mode"] == "ant-int-pot-float-flint"

    # quant_6bit_ptq.sh sets only -wl/-al=100; wu/au stay at default 150.
    ptq6 = run_recipe.load_recipe(
        os.path.join(REPO, "recipes", "ant_imagenet_ptq6.toml"))
    assert ptq6["defaults"]["w_low"] == 100 and ptq6["defaults"]["w_up"] == 150
    assert ptq6["defaults"]["a_low"] == 100 and ptq6["defaults"]["a_up"] == 150


def test_per_run_set_overrides():
    sets = run_recipe.parse_sets(["*_squad:data=/d/v1.json",
                                  "*_squad2:data=/d/v2.json"])
    base = {"tool": "squad_run"}
    c1 = run_recipe.build_command({"name": "bert_base_squad"}, base, [], sets)
    c2 = run_recipe.build_command({"name": "bert_base_squad2"}, base, [], sets)
    assert "/d/v1.json" in c1 and "/d/v2.json" not in c1
    assert "/d/v2.json" in c2 and "/d/v1.json" not in c2


def test_cli_dry_run_and_list():
    rec = os.path.join(REPO, "recipes", "olive_clm.toml")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_recipe.py"),
         rec, "--only", "gpt2xl_*", "--dry-run", "--", "--max_blocks", "2"],
        capture_output=True, text=True)
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.splitlines() if l.startswith("[gpt2xl_")]
    assert len(lines) == 2
    assert "--max_blocks 2" in lines[0] and "clm_eval.py" in lines[0]

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_recipe.py"),
         rec, "--list"], capture_output=True, text=True)
    assert out.returncode == 0
    assert "bloom7b1_c4" in out.stdout
