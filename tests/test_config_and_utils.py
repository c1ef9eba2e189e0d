"""Config merge/parser, prompts, maskers, stat tracking, inflect-lite."""

import numpy as np
import pytest

from ddpo_tpu.training.prompts import PROMPT_FNS, make_prompts
from ddpo_tpu.training.stat_tracking import PerPromptStatTracker
from ddpo_tpu.utils import inflect_lite
from ddpo_tpu.utils.maskers import (
    Percentile,
    StreamingAverage,
    StreamingPercentile,
    Threshold,
    make_masker,
)
from ddpo_tpu.utils.parser import Parser


# --------------------------------- parser ------------------------------------ #


def test_parser_three_level_merge(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = Parser().parse_args(
        "pg", ["--dataset", "compressed-animals"], setup=False
    )
    # base default overridden by dataset common
    assert args.prompt_fn == "imagenet_animals"
    assert args.filter_field == "jpeg"
    # base defaults kept where dataset has no override
    assert args.sample_batch_size == 8
    # round-3 default: noise-proportional retune of the reference's 1e-4
    # for the bf16 defaults (config/base.py comment, bench_logp.py)
    assert args.ppo_clip_range == 2e-4


def test_parser_cli_extras_type_coercion(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = Parser().parse_args(
        "pg",
        [
            "--dataset", "compressed-animals",
            "--train_batch_size", "4",
            "--learning_rate", "3e-4",
            "--train_cfg", "False",
            "--filter_field", "neg_jpeg",
            "--max_grad_norm", "None",
        ],
        setup=False,
    )
    assert args.train_batch_size == 4 and isinstance(args.train_batch_size, int)
    assert args.learning_rate == 3e-4
    assert args.train_cfg is False
    assert args.filter_field == "neg_jpeg"
    assert args.max_grad_norm is None


def test_parser_lazy_fstrings(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = Parser().parse_args(
        "train",
        ["--dataset", "compressed-animals-rwr", "--iteration", "3"],
        setup=False,
    )
    # "f:models/{iteration+1}" chains RWR iterations
    assert args.savepath == "models/4"
    assert args.loadpath == "samples/3"
    assert args.modelpath == "models/3"


# --------------------------------- prompts ----------------------------------- #


def test_prompt_registry_has_reference_parity():
    expected = {
        "person_pet", "consistent_animals", "consistent_imagenet_animals",
        "consistent_imagenet_animals_3", "n_fingers", "imagenet_single",
        "imagenet_aesthetic", "imagenet_simple", "imagenet_dogs",
        "animal_debug", "simple_dogs", "imagenet_animals", "from_file",
        "vqa_dataset", "manual", "nouns_activities", "counting",
    }
    assert expected <= set(PROMPT_FNS)


def test_make_prompts_batchify():
    prompts, training, meta = make_prompts("imagenet_animals", 8)
    assert len(prompts) == len(training) == len(meta) == 8
    assert all(isinstance(p, str) for p in prompts)


def test_make_prompts_identical_batch():
    prompts, training, meta = make_prompts("imagenet_animals", 8, identical_batch=True)
    assert len(set(prompts)) == 1


def test_animal_debug_deterministic():
    prompts, *_ = make_prompts("animal_debug", 4)
    assert prompts == ["a peacock"] * 4


def test_from_file_prompts():
    prompts, *_ = make_prompts("from_file", 4, loadpath="assets/common_animals.txt")
    from ddpo_tpu.utils.loaders import load_lines

    lines = load_lines("assets/common_animals.txt")
    assert all(p in lines for p in prompts)


def test_counting_prompts_metadata():
    prompts, training, meta = make_prompts(
        "counting", 4, nouns_path="assets/very_simple_animals.txt",
        number_range=(2, 8),
    )
    assert "questions" in meta[0] and len(meta[0]["questions"]) == 2
    assert meta[0]["answers"][0] in {
        "two", "three", "four", "five", "six", "seven", "eight"
    }


def test_vqa_dataset_prompts():
    prompts, training, meta = make_prompts(
        "vqa_dataset", 2, loadpath="assets/vqa_debug.txt"
    )
    assert len(meta[0]["questions"]) == 3
    assert prompts[0] == meta[0]["prompt"]


def test_nouns_activities_article():
    prompts, *_ = make_prompts(
        "nouns_activities", 8,
        nouns_path="assets/common_animals.txt",
        activities_path="assets/activities_v0.txt",
    )
    assert all(p.startswith(("a ", "an ")) for p in prompts)


# ------------------------------- inflect-lite -------------------------------- #


def test_inflect_articles():
    assert inflect_lite.a("dog") == "a dog"
    assert inflect_lite.a("elephant") == "an elephant"
    assert inflect_lite.a("octopus swimming") == "an octopus swimming"


def test_inflect_numbers():
    assert inflect_lite.number_to_words(2) == "two"
    assert inflect_lite.number_to_words(8) == "eight"
    assert inflect_lite.number_to_words(21) == "twenty-one"


def test_inflect_plurals():
    assert inflect_lite.plural("dog") == "dogs"
    assert inflect_lite.plural("fox") == "foxes"
    assert inflect_lite.plural("butterfly") == "butterflies"
    assert inflect_lite.plural("wolf") == "wolves"


# --------------------------------- maskers ----------------------------------- #


def test_percentile_masker():
    xs = np.arange(100, dtype=np.float64)
    mask = Percentile(90)(xs)
    assert mask.sum() == 10 and mask[-10:].all()


def test_streaming_percentile_accumulates():
    m = StreamingPercentile(50)
    first = m(np.arange(10, dtype=np.float64))
    assert first.sum() == 5
    # second batch is all larger -> all kept w.r.t. running percentile
    second = m(np.arange(100, 110, dtype=np.float64))
    assert second.all()


def test_threshold_masker_and_factory():
    mask = make_masker("threshold", 0.65)(np.array([0.5, 0.65, 0.9]))
    np.testing.assert_array_equal(mask, [False, True, True])
    assert isinstance(make_masker("percentile", 90), Percentile)
    assert isinstance(make_masker("streaming_percentile", 0), StreamingPercentile)


def test_streaming_average():
    xs = np.random.default_rng(0).normal(size=100)
    avg = StreamingAverage()
    for x in xs:
        avg(x)
    np.testing.assert_allclose(avg.avg, xs.mean(), rtol=1e-10)


# ------------------------------ stat tracking -------------------------------- #


def test_per_prompt_stats_global_fallback():
    tracker = PerPromptStatTracker(buffer_size=32, min_count=16)
    prompts = np.array(["a", "b"] * 4)
    rewards = np.arange(8, dtype=np.float64)
    adv = tracker.update(prompts, rewards)
    expected = (rewards - rewards.mean()) / (rewards.std() + 1e-6)
    np.testing.assert_allclose(adv, expected, rtol=1e-6)


def test_per_prompt_stats_switches_to_per_prompt():
    tracker = PerPromptStatTracker(buffer_size=32, min_count=4)
    prompts = np.array(["a"] * 8)
    r1 = np.arange(8, dtype=np.float64)
    tracker.update(prompts, r1)
    r2 = np.arange(8, dtype=np.float64) + 10
    adv = tracker.update(prompts, r2)
    buf = np.concatenate([r1, r2])
    expected = (r2 - buf.mean()) / (buf.std() + 1e-6)
    np.testing.assert_allclose(adv, expected, rtol=1e-6)


def test_per_prompt_stats_ring_buffer_evicts():
    tracker = PerPromptStatTracker(buffer_size=4, min_count=1)
    prompts = np.array(["a"] * 4)
    tracker.update(prompts, np.zeros(4))
    tracker.update(prompts, np.full(4, 100.0))
    stats = tracker.get_stats()
    assert stats["a"]["mean"] == 100.0  # zeros evicted
    assert stats["a"]["count"] == 4
