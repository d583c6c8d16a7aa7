"""CHAIR metric (Caption Hallucination Assessment with Image Relevance).

Parity target: eval_hall/eval_chair.py:138-403 (itself from
LisaAnne/Hallucination). Reports CHAIRs (fraction of captions with any
hallucinated COCO object), CHAIRi (fraction of generated object mentions
that are hallucinated), Recall (ground-truth objects recalled), Len
(0.01 * mean caption tokens).

Ground truth objects per image come from MSCOCO instance segments +
ground-truth captions (both train+val 2014), exactly like the reference.
The synonym table and the double-word/qualifier rules are the metric's
published definition data (LisaAnne/Hallucination synonyms.txt).
"""

from __future__ import annotations

import json
import os
import pickle
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

from halva_tpu.evals.lemmatize import lemmatize_caption

# Published CHAIR synonym groups (LisaAnne/Hallucination data/synonyms.txt):
# first entry of each group is the canonical COCO object.
SYNONYM_GROUPS: List[List[str]] = [g.split(", ") for g in """\
person, girl, boy, man, woman, kid, child, chef, baker, people, adult, rider, children, baby, worker, passenger, sister, biker, policeman, cop, officer, lady, cowboy, bride, groom, male, female, guy, traveler, mother, father, gentleman, pitcher, player, skier, snowboarder, skater, skateboarder, person, woman, guy, foreigner, child, gentleman, caller, offender, coworker, trespasser, patient, politician, soldier, grandchild, serviceman, walker, drinker, doctor, bicyclist, thief, buyer, teenager, student, camper, driver, solider, hunter, shopper, villager
bicycle, bike, bicycle, bike, unicycle, minibike, trike
car, automobile, van, minivan, sedan, suv, hatchback, cab, jeep, coupe, taxicab, limo, taxi
motorcycle, scooter,  motor bike, motor cycle, motorbike, scooter, moped
airplane, jetliner, plane, air plane, monoplane, aircraft, jet, jetliner, airbus, biplane, seaplane
bus, minibus, trolley
train, locomotive, tramway, caboose
truck, pickup, lorry, hauler, firetruck
boat, ship, liner, sailboat, motorboat, dinghy, powerboat, speedboat, canoe, skiff, yacht, kayak, catamaran, pontoon, houseboat, vessel, rowboat, trawler, ferryboat, watercraft, tugboat, schooner, barge, ferry, sailboard, paddleboat, lifeboat, freighter, steamboat, riverboat, battleship, steamship
traffic light, street light, traffic signal, stop light, streetlight, stoplight
fire hydrant, hydrant
stop sign
parking meter
bench, pew
bird, ostrich, owl, seagull, goose, duck, parakeet, falcon, robin, pelican, waterfowl, heron, hummingbird, mallard, finch, pigeon, sparrow, seabird, osprey, blackbird, fowl, shorebird, woodpecker, egret, chickadee, quail, bluebird, kingfisher, buzzard, willet, gull, swan, bluejay, flamingo, cormorant, parrot, loon, gosling, waterbird, pheasant, rooster, sandpiper, crow, raven, turkey, oriole, cowbird, warbler, magpie, peacock, cockatiel, lorikeet, puffin, vulture, condor, macaw, peafowl, cockatoo, songbird
cat, kitten, feline, tabby
dog, puppy, beagle, pup, chihuahua, schnauzer, dachshund, rottweiler, canine, pitbull, collie, pug, terrier, poodle, labrador, doggie, doberman, mutt, doggy, spaniel, bulldog, sheepdog, weimaraner, corgi, cocker, greyhound, retriever, brindle, hound, whippet, husky
horse, colt, pony, racehorse, stallion, equine, mare, foal, palomino, mustang, clydesdale, bronc, bronco
sheep, lamb, ram, lamb, goat, ewe
cow, cattle, oxen, ox, calf, cattle, holstein, heifer, buffalo, bull, zebu, bison
elephant
bear, panda
zebra
giraffe
backpack, knapsack
umbrella
handbag, wallet, purse, briefcase
tie, bow, bow tie
suitcase, suit case, luggage
frisbee
skis, ski
snowboard
sports ball, ball
kite
baseball bat
baseball glove
skateboard
surfboard, longboard, skimboard, shortboard, wakeboard
tennis racket, racket
bottle
wine glass
cup
fork
knife, pocketknife, knive
spoon
bowl, container
banana
apple
sandwich, burger, sub, cheeseburger, hamburger
orange
broccoli
carrot
hot dog
pizza
donut, doughnut, bagel
cake,  cheesecake, cupcake, shortcake, coffeecake, pancake
chair, seat, stool
couch, sofa, recliner, futon, loveseat, settee, chesterfield
potted plant, houseplant
bed
dining table, table, desk
toilet, urinal, commode, toilet, lavatory, potty
tv, monitor, televison, television
laptop, computer, notebook, netbook, lenovo, macbook, laptop computer
mouse
remote
keyboard
cell phone, mobile phone, phone, cellphone, telephone, phon, smartphone, iPhone
microwave
oven, stovetop, stove, stove top oven
toaster
sink
refrigerator, fridge, fridge, freezer
book
clock
vase
scissors
teddy bear, teddybear
hair drier, hairdryer
toothbrush""".splitlines()]

DOUBLE_WORDS = [
    "motor bike", "motor cycle", "air plane", "traffic light",
    "street light", "traffic signal", "stop light", "fire hydrant",
    "stop sign", "parking meter", "suit case", "sports ball",
    "baseball bat", "baseball glove", "tennis racket", "wine glass",
    "hot dog", "cell phone", "mobile phone", "teddy bear", "hair drier",
    "potted plant", "bow tie", "laptop computer", "stove top oven",
    "home plate", "train track",
]
ANIMAL_WORDS = [
    "bird", "cat", "dog", "horse", "sheep", "cow", "elephant", "bear",
    "zebra", "giraffe", "animal", "cub",
]
VEHICLE_WORDS = ["jet", "train"]


class ChairEvaluator:
    def __init__(self, imid_to_objects: Dict[int, set]):
        self.mscoco_objects: List[str] = []
        self.inverse_synonym: Dict[str, str] = {}
        for group in SYNONYM_GROUPS:
            group = [g.strip() for g in group]
            self.mscoco_objects.extend(group)
            for s in group:
                self.inverse_synonym[s] = group[0]
        self._object_set = set(self.mscoco_objects)

        self.double_word_dict = {w: w for w in DOUBLE_WORDS}
        for a in ANIMAL_WORDS:
            self.double_word_dict[f"baby {a}"] = a
            self.double_word_dict[f"adult {a}"] = a
        for v in VEHICLE_WORDS:
            self.double_word_dict[f"passenger {v}"] = v
        self.double_word_dict["bow tie"] = "tie"
        self.double_word_dict["toilet seat"] = "toilet"
        self.double_word_dict["wine glas"] = "wine glass"

        self.imid_to_objects = imid_to_objects

    # ---- construction -----------------------------------------------
    @classmethod
    def from_coco(cls, coco_path: str) -> "ChairEvaluator":
        """Build GT objects from instances + captions (train+val 2014)."""
        ev = cls(defaultdict(set))
        imid_to_objects = defaultdict(list)

        insts = _combine(coco_path, "instances")
        id_to_name = {c["id"]: c["name"] for c in insts["categories"]}
        for ann in insts["annotations"]:
            node = ev.inverse_synonym[id_to_name[ann["category_id"]]]
            imid_to_objects[ann["image_id"]].append(node)

        caps = _combine(coco_path, "captions")
        for ann in caps["annotations"]:
            _, node_words, _, _ = ev.caption_to_words(ann["caption"])
            imid_to_objects[ann["image_id"]].extend(node_words)

        ev.imid_to_objects = {
            k: set(v) for k, v in imid_to_objects.items()
        }
        return ev

    @classmethod
    def from_cache(cls, path: str) -> "ChairEvaluator":
        with open(path, "rb") as f:
            obj = pickle.load(f)
        if isinstance(obj, cls):
            return obj
        # accept a raw {imid: set} dict cache
        return cls(obj)

    def save_cache(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    # ---- core -------------------------------------------------------
    def caption_to_words(
        self, caption: str
    ) -> Tuple[List[str], List[str], List[int], List[str]]:
        # the object vocabulary doubles as the singularizer's dictionary
        # (WordNet-morphy-style candidate selection; see evals/lemmatize)
        words = lemmatize_caption(caption, vocab=self._object_set)

        i = 0
        double_words: List[str] = []
        idxs: List[int] = []
        while i < len(words):
            idxs.append(i)
            dw = " ".join(words[i : i + 2])
            if dw in self.double_word_dict:
                double_words.append(self.double_word_dict[dw])
                i += 2
            else:
                double_words.append(words[i])
                i += 1
        words = double_words

        if "toilet" in words and "seat" in words:
            words = [w for w in words if w != "seat"]

        keep = [
            (idx, w)
            for idx, w in zip(idxs, words)
            if w in self._object_set
        ]
        idxs = [i for i, _ in keep]
        found = [w for _, w in keep]
        node_words = [self.inverse_synonym[w] for w in found]
        return found, node_words, idxs, double_words

    def compute(
        self, captions: Sequence[str], image_ids: Sequence[int]
    ) -> Dict:
        assert len(captions) == len(image_ids)
        num_caps = 0
        num_hall_caps = 0
        hall_words = 0
        coco_words = 0
        len_caps = 0
        recall_num = 0
        recall_den = 0
        sentences = []
        for cap, imid in zip(captions, image_ids):
            words, node_words, idxs, raw = self.caption_to_words(cap)
            gt = self.imid_to_objects.get(imid, set())
            hallucinated = []
            recalled = set()
            for w, nw, idx in zip(words, node_words, idxs):
                if nw not in gt:
                    hall_words += 1
                    hallucinated.append((w, nw))
                else:
                    recalled.add(nw)
            coco_words += len(node_words)
            num_caps += 1
            len_caps += len(raw)
            if hallucinated:
                num_hall_caps += 1
            recall_num += len(recalled)
            recall_den += len(gt)
            sentences.append(
                {
                    "image_id": imid,
                    "caption": cap,
                    "mscoco_hallucinated_words": hallucinated,
                    "mscoco_gt_words": sorted(gt),
                    "mscoco_generated_words": node_words,
                    "metrics": {
                        "CHAIRs": int(bool(hallucinated)),
                        "CHAIRi": (
                            len(hallucinated) / len(words) if words else 0.0
                        ),
                        "Recall": (
                            len(recalled) / len(gt) if gt else 0.0
                        ),
                    },
                }
            )
        return {
            "sentences": sentences,
            "overall_metrics": {
                "CHAIRs": num_hall_caps / max(num_caps, 1),
                "CHAIRi": hall_words / max(coco_words, 1),
                "Recall": recall_num / max(recall_den, 1),
                "Len": 0.01 * len_caps / max(num_caps, 1),
            },
        }

    def compute_from_file(
        self,
        cap_file: str,
        image_id_key: str = "image_id",
        caption_key: str = "caption",
    ) -> Dict:
        caps, imids = load_captions_file(
            cap_file, image_id_key, caption_key
        )
        return self.compute(caps, imids)


def _combine(coco_path: str, kind: str) -> Dict:
    out: Dict = {}
    for split in ("train", "val"):
        p = os.path.join(coco_path, f"{kind}_{split}2014.json")
        with open(p) as f:
            d = json.load(f)
        for k in ("images", "annotations"):
            out.setdefault(k, []).extend(d.get(k, []))
        if "categories" in d:
            out["categories"] = d["categories"]
    return out


def load_captions_file(
    cap_file: str, image_id_key: str, caption_key: str
) -> Tuple[List[str], List[int]]:
    if cap_file.endswith(".jsonl"):
        rows = [json.loads(l) for l in open(cap_file)]
    else:
        rows = json.load(open(cap_file))
    return (
        [r[caption_key] for r in rows],
        [r[image_id_key] for r in rows],
    )
