// DOM-level check of the served upload UI (round-5 verdict item 8).
//
// No browser ships in this container, so this harness is the
// closest honest substitute: it fetches the REAL form from the live
// HTTP server, extracts the REAL <script> the page ships, and
// executes it unmodified against a minimal DOM shim — then drives
// the same user gestures a browser would dispatch:
//
//   1. drag-and-drop a File onto #file-drop  → the script's drop
//      handler must assign it to the <input type=file>;
//   2. submit the form                        → the script must
//      fetch-POST with xhr=1, start the 1 Hz poll, move the
//      <progress> bar, and navigate to the table URL on completion;
//   3. GET the navigated URL                  → the server's table
//      view must report the ingested rows.
//
// Usage: node browser_shim.mjs <base-url>   (exits 0 on success)

const base = process.argv[2] || "http://127.0.0.1:8765";

class Element {
  constructor(tag) {
    this.tag = tag;
    this.listeners = {};
    this.classes = new Set();
    this.value = 0;
    const self = this;
    this.classList = {
      add: (c) => self.classes.add(c),
      remove: (c) => self.classes.delete(c),
      contains: (c) => self.classes.has(c),
    };
  }
  addEventListener(type, fn) {
    (this.listeners[type] ||= []).push(fn);
  }
  dispatchEvent(ev) {
    for (const fn of this.listeners[ev.type] || []) fn(ev);
  }
}

const form = new Element("form");
form.action = "/-/upload-csvs";
const fileInput = new Element("input");
fileInput.files = [];
const drop = new Element("div");
const bar = new Element("progress");

const byId = {
  uploadForm: form,
  csvUpload: fileInput,
  "file-drop": drop,
};
const document = {
  getElementById: (id) => byId[id],
  querySelector: (sel) => (sel === "progress.progress" ? bar : null),
};

let navigatedTo = null;
let alerted = null;
const window = {};
Object.defineProperty(window, "location", {
  set(v) {
    navigatedTo = v;
  },
  get() {
    return navigatedTo;
  },
});

// new FormData(form) in a browser collects the form's fields; the
// shim form exposes them explicitly.
const NativeFormData = globalThis.FormData;
class ShimFormData extends NativeFormData {
  constructor(f) {
    super();
    if (f === form) {
      this.append("table_name", f.tableName || "");
      if (fileInput.files[0]) this.append("csv", fileInput.files[0]);
    }
  }
}

// resolve the page's relative fetch URLs against the server base
const nativeFetch = globalThis.fetch;
const fetch = (url, opts) =>
  nativeFetch(new URL(url, base).href, opts);

const html = await (await nativeFetch(`${base}/-/upload-csvs`)).text();
const script = html.match(/<script>([\s\S]*?)<\/script>/)[1];

// execute the served script verbatim against the shim globals
new Function(
  "document", "window", "fetch", "FormData", "alert",
  "setInterval", "clearInterval",
  script
)(
  document, window, fetch, ShimFormData,
  (msg) => { alerted = msg; },
  setInterval, clearInterval
);

// ---- gesture 1: drag-and-drop --------------------------------------
const csv = "name,age\nalice,30\nbob,25\ncarol,41\n";
const file = new File([csv], "people_browser.csv", { type: "text/csv" });
drop.dispatchEvent({ type: "dragenter", preventDefault() {} });
if (!drop.classList.contains("dragging"))
  throw new Error("dragenter did not set the dragging class");
drop.dispatchEvent({
  type: "drop",
  preventDefault() {},
  dataTransfer: { files: [file] },
});
if (!drop.classList.contains("dragging") === false)
  throw new Error("drop did not clear the dragging class");
if (fileInput.files[0]?.name !== "people_browser.csv")
  throw new Error("drop did not assign the file to the input");
console.log("drop-assigned:", fileInput.files[0].name);

// ---- gesture 2: submit → poll → progress bar → navigation ----------
form.tableName = "people_browser";
form.dispatchEvent({ type: "submit", preventDefault() {} });

const deadline = Date.now() + 120_000;
while (navigatedTo === null && alerted === null) {
  if (Date.now() > deadline) throw new Error("poll never completed");
  await new Promise((r) => setTimeout(r, 250));
}
if (alerted !== null) throw new Error(`page alerted: ${alerted}`);
if (bar.value !== 100)
  throw new Error(`progress bar at ${bar.value}, expected 100`);
console.log("navigated-to:", navigatedTo, "bar:", bar.value);

// ---- gesture 3: the landing page reports the ingested table --------
const landing = await (await fetch(navigatedTo)).json();
if (landing.rows !== 3)
  throw new Error(`table view rows=${landing.rows}, expected 3`);
if (!landing.columns.includes("name") || !landing.columns.includes("age"))
  throw new Error(`table view columns=${landing.columns}`);
console.log("landing:", JSON.stringify(landing));
console.log("BROWSER-SHIM-OK");
